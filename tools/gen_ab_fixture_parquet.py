"""Materialize the deterministic AB-shaped fixture tables to parquet.

Writes each table from ``sources.fixtures.generate_fixture_tables`` (seed=42)
as a SINGLE parquet file under ``tests/fixtures/ab/<table>.parquet`` so that
fixture-based registered queries (e.g. ``similarity_vectors``) and their DuckDB
oracles read the exact same bytes.  The files are committed; re-run this tool
whenever ``sources/fixtures.py`` changes:

    python3 tools/gen_ab_fixture_parquet.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from acousticbrainz_server_spark.session import get_spark  # noqa: E402
from acousticbrainz_server_spark.sources.fixtures import generate_fixture_tables  # noqa: E402

OUT_DIR = os.path.join(REPO, "tests", "fixtures", "ab")


def write_lsh_planes() -> None:
    """Commit the RP-LSH plane matrix (seed 42, 10 tables x 64 dims) so the
    ann_lsh_topk oracle buckets with the exact same planes as the Spark index
    (similarity/ann.py:rp_planes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from acousticbrainz_server_spark.similarity.ann import rp_planes

    planes = rp_planes(num_hash_tables=10, dim=64, seed=42)
    table = pa.table(
        {
            "table_idx": pa.array(range(len(planes)), type=pa.int32()),
            "plane": pa.array(planes, type=pa.list_(pa.float64())),
        }
    )
    dest = os.path.join(OUT_DIR, "lsh_planes.parquet")
    pq.write_table(table, dest)
    print(f"wrote {dest} ({os.path.getsize(dest)} bytes)")


def main() -> None:
    spark = get_spark(cpus=8)
    tables = generate_fixture_tables(spark)
    os.makedirs(OUT_DIR, exist_ok=True)
    write_lsh_planes()
    for name, df in tables.items():
        tmp = os.path.join(OUT_DIR, f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(OUT_DIR, f"{name}.parquet")
        if os.path.exists(dest):
            os.remove(dest)
        shutil.move(part, dest)
        shutil.rmtree(tmp)
        print(f"wrote {dest} ({os.path.getsize(dest)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
