"""Commit the deterministic PQ codebooks for the sf0.01 embeddings.

``similarity/pq.pq_train`` runs one deterministic k-means fit per subspace
(md5-seeded sample, maxmin init, fixed rounds — see kmeans_fit), so the
codebooks are reproducible; committing them as an EXPLODED (s, c, o, w)
parquet lets the DuckDB oracle for ``ann_pq_adc_topk`` express assignment
and ADC lookup in plain SQL over the exact same model the Spark side ships —
the committed-artifact pattern of lsh_planes / kmeans_centroids.

Also prints the minimum assignment margin (best vs second-best codeword over
every (vector, subspace)) so the tie-robustness of cross-engine argmin parity
is a measured number, not a hope.

Re-run whenever the PQ hyperparameters change:

    python3 tools/gen_pq_fixture.py
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
M = 8
K = 16
DIM = 64
MAX_ITER = 3


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from acousticbrainz_server_spark.similarity.pq import _dist_tables, pq_train
    from acousticbrainz_server_spark.sources.tables import load_table

    spark = get_spark("gen_pq_fixture", cpus=8)
    emb = load_table(spark, GATE_SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    books = pq_train(emb, dim=DIM, m=M, k=K, id_col="vec_id", vec_col="v", max_iter=MAX_ITER)

    # margin audit: distance gap between the winning and runner-up codeword
    x = np.asarray([list(r["v"]) for r in emb.collect()], dtype=np.float64)
    tabs = _dist_tables(x, books)  # n x m x k
    srt = np.sort(tabs, axis=2)
    margin = float((srt[:, :, 1] - srt[:, :, 0]).min())
    print(f"min assignment margin best-vs-2nd: {margin:.3e}")
    assert margin > 1e-9, "assignment ties too close for cross-engine argmin parity"

    rows = [
        (s, c, o, books[s][c][o])
        for s in range(M)
        for c in range(K)
        for o in range(DIM // M)
    ]
    df = spark.createDataFrame(rows, "s INT, c INT, o INT, w DOUBLE").coalesce(1)
    tmp = os.path.join(OUT_DIR, "_pq_tmp")
    df.write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(OUT_DIR, "pq_codebooks.parquet"))
    shutil.rmtree(tmp)
    print(f"wrote {OUT_DIR}/pq_codebooks.parquet (m={M}, k={K}, dim={DIM})")
    spark.stop()


if __name__ == "__main__":
    main()
