"""tar.zst dump-container parity tests (db/dump.py:968-1013 layout,
:449-497 import protocol).  The parity surface is the MEMBER LIST — stamp
members first, ``abdump/<table>`` for single-member tables,
``abdump/<table>/<table>-<N>`` ascending from 1 for split tables — plus the
schema-version gate and the byte round trip of table content."""

from __future__ import annotations

import os
import subprocess
import tarfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from acousticbrainz_server_spark.sources.archive import (
    package_dump_archive,
    read_dump_archive,
)
from acousticbrainz_server_spark.sources.dumps import SCHEMA_VERSION, dump_table_tsv

SF = "/root/testdata/sf0.001"


def _open_archive_stream(archive_path: str):
    """Stream the container the way the reference import does (zstd
    --decompress --stdout | tar r|, db/dump.py:451-460) — falling back to a
    direct read when the zstd binary is absent from the environment, in
    which case the packager wrote an uncompressed tar with the identical
    member layout (sources/archive.py module doc).  The parity surface
    under test — member list, stamp order, split numbering — is the same
    either way."""
    import shutil

    if shutil.which("zstd") is not None:
        zstd = subprocess.Popen(
            ["zstd", "--decompress", "--stdout", archive_path],
            stdout=subprocess.PIPE,
        )
        return zstd.stdout, zstd
    return open(archive_path, "rb"), None


def _member_names(archive_path: str) -> list[str]:
    stream, proc = _open_archive_stream(archive_path)
    with tarfile.open(fileobj=stream, mode="r|") as tar:
        names = [m.name for m in tar]
    stream.close()
    if proc is not None:
        proc.wait()
    return names


@pytest.fixture(scope="module")
def packaged(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("abarchive"))
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").limit(500)
    # single-member table must be one part (the reference's small tables are
    # one COPY file each, db/dump.py:241-252)
    dump_table_tsv(nation.coalesce(1), os.path.join(root, "nation"))
    # split table: small rows_per_file forces multiple numbered members
    dump_table_tsv(orders, os.path.join(root, "orders"), rows_per_file=150)
    archive = os.path.join(root, "abdump-test.tar.zst")
    members = package_dump_archive(
        root,
        archive,
        ["nation", "orders"],
        time_now=datetime(2015, 1, 1, 12, 0, 0),
        partitioned_tables=("orders",),
    )
    return root, archive, members, nation, orders


def test_member_layout_parity(packaged):
    _, archive, members, _, _ = packaged
    names = _member_names(archive)
    assert names == members
    an = "abdump-test"
    # db/dump.py:993-1004: stamps first, in this order
    assert names[:3] == [
        f"{an}/SCHEMA_SEQUENCE",
        f"{an}/TIMESTAMP",
        f"{an}/COPYING",
    ]
    # db/dump.py:254-260: one member for the small table
    assert names[3] == f"{an}/abdump/nation"
    # db/dump.py:203-240: numbered splits from 1, ascending
    splits = names[4:]
    assert len(splits) >= 2, "rows_per_file=150 over 500 rows must split"
    assert splits == [f"{an}/abdump/orders/orders-{i}" for i in range(1, len(splits) + 1)]


def test_stamp_contents(packaged):
    _, archive, _, _, _ = packaged
    stream, proc = _open_archive_stream(archive)
    seen = {}
    with tarfile.open(fileobj=stream, mode="r|") as tar:
        for m in tar:
            base = m.name.split("/")[-1]
            if base in ("SCHEMA_SEQUENCE", "TIMESTAMP", "COPYING"):
                seen[base] = tar.extractfile(m).read().decode()
    stream.close()
    if proc is not None:
        proc.wait()
    assert seen["SCHEMA_SEQUENCE"] == str(SCHEMA_VERSION)
    # db/dump.py:998-1002: isoformat with a space separator
    assert seen["TIMESTAMP"] == "2015-01-01 12:00:00"
    assert "CC0" in seen["COPYING"] or "Public Domain" in seen["COPYING"]


def test_roundtrip_values(packaged, spark):
    root, archive, _, nation, orders = packaged
    from acousticbrainz_server_spark.sources.dumps import import_table_tsv

    info = read_dump_archive(archive, os.path.join(root, "x"))
    assert info["timestamp"] == "2015-01-01 12:00:00"
    back_nation = import_table_tsv(spark, info["tables"]["nation"], nation.schema)
    back_orders = import_table_tsv(spark, info["tables"]["orders"], orders.schema)
    assert sorted(back_nation.collect()) == sorted(nation.collect())
    assert back_orders.count() == orders.count()
    # exact integer-cents sum: double addition is not associative, so a raw
    # sum differs in ulps across partitionings even when every row matches
    cents = F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
    a = orders.agg(cents, F.sum("o_orderkey")).collect()[0]
    b = back_orders.agg(cents, F.sum("o_orderkey")).collect()[0]
    assert a == b


def test_schema_version_gate(packaged, tmp_path):
    _, archive, _, _, _ = packaged
    with pytest.raises(ValueError, match="Incorrect schema version"):
        read_dump_archive(
            archive, str(tmp_path), expected_schema_version=SCHEMA_VERSION + 1
        )


def test_out_of_order_split_rejected(tmp_path):
    """A tampered archive whose split members regress in number must be
    rejected (db/dump.py:480-484's ascending assert)."""
    import io

    tar_path = str(tmp_path / "bad.tar")
    with tarfile.open(tar_path, "w") as tar:

        def add(name, payload: bytes):
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))

        add("bad/SCHEMA_SEQUENCE", str(SCHEMA_VERSION).encode())
        add("bad/abdump/t/t-2", b"x\n")
        add("bad/abdump/t/t-1", b"y\n")
    with pytest.raises(ValueError, match="out-of-order"):
        read_dump_archive(tar_path, str(tmp_path / "out"))
