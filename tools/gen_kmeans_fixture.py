"""Commit the deterministic k-means centroids for the sf0.01 embeddings.

``similarity/kmeans.kmeans_fit`` is fully deterministic (md5-seeded sample,
maxmin seeding, fixed Lloyd's rounds, numpy float64 single-threaded), so the
centroids a live fit produces at the gate's sf (0.01) are reproducible.
Committing them as a fixture parquet lets the DuckDB oracles for
``embedding_kmeans_assign`` and ``ann_ivf_kmeans_topk`` express the
nearest-centroid assignment in plain SQL over the exact same model the Spark
side trains — the same committed-artifact trick as lsh_planes.parquet.

Re-run whenever the kmeans hyperparameters in plans/vectors.py change:

    python3 tools/gen_kmeans_fixture.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from acousticbrainz_server_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(REPO, "tests", "fixtures", "ab")
GATE_SF_DIR = "/root/testdata/sf0.01"
K = 8
MAX_ITER = 3


def main() -> None:
    from pyspark.sql import functions as F

    from acousticbrainz_server_spark.similarity.kmeans import kmeans_fit
    from acousticbrainz_server_spark.sources.tables import load_table

    spark = get_spark("gen_kmeans_fixture", cpus=8)
    emb = load_table(spark, GATE_SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    centroids = kmeans_fit(emb, k=K, max_iter=MAX_ITER, id_col="vec_id", vec_col="v", dim=64)
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell INT, centroid ARRAY<DOUBLE>"
    ).coalesce(1)
    tmp = os.path.join(OUT_DIR, "_kmeans_tmp")
    df.write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(OUT_DIR, "kmeans_centroids.parquet"))
    shutil.rmtree(tmp)
    print(f"wrote {OUT_DIR}/kmeans_centroids.parquet (k={K}, max_iter={MAX_ITER})")
    spark.stop()


if __name__ == "__main__":
    main()
