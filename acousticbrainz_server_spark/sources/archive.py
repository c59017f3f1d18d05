"""tar.zst dump-container packaging (SURVEY.md §2.1 S4/S5 container format).

Reference: db/dump.py:968-1013 (`_dump_tables`) assembles the published
archive — a streaming tar piped through an external ``zstd --compress``
process — with this exact member layout::

    <archive_name>/SCHEMA_SEQUENCE            # schema version int
    <archive_name>/TIMESTAMP                  # time.isoformat(" ")
    <archive_name>/COPYING                    # license text
    <archive_name>/abdump/<table>             # one member per small table
    <archive_name>/abdump/<table>/<table>-<N> # numbered splits, N from 1,
                                              # for PARTITIONED_TABLES
                                              # (db/dump.py:174-180, 203-240)

and db/dump.py:449-497 (`import_db_dump`) streams it back through ``zstd
--decompress --stdout``, verifying SCHEMA_SEQUENCE before any data member
and asserting ascending file numbers per partitioned table.

Spark-first split of labor: the TABLE CONTENT is produced distributed
(``dump_table_tsv``'s parallel write with ``maxRecordsPerFile`` doing the
reference's 500k-row splitting); only the final packaging of the
already-written dump directory into the single published ``.tar.zst``
artifact runs on the driver — exactly as the reference's own tar assembly
is a single sequential process (db/dump.py:988 one zstd pipe).  At 100 TB
the archive step streams file-by-file (constant memory, no re-read of the
DataFrame), and a sharded publication would simply run one
``package_dump_archive`` per shard directory.

If the ``zstd`` binary is absent the packager falls back to an
uncompressed ``.tar`` with the same member layout (the layout, stamps and
import gate — the parity surface — are identical either way).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tarfile
from datetime import datetime

from .dumps import SCHEMA_VERSION

# db/dump.py:174-180: tables whose dumps are split into numbered files.
DEFAULT_PARTITIONED_TABLES = ("lowlevel_json", "highlevel_model")

# Stand-in for db/licenses/COPYING-PublicDomain (db/dump.py:40-41): the dump
# data is published under CC0; the member NAME is the parity surface.
LICENSE_TEXT = (
    "Creative Commons CC0 1.0 Universal Public Domain Dedication\n"
    "https://creativecommons.org/publicdomain/zero/1.0/\n"
)


def _zstd_available() -> bool:
    return shutil.which("zstd") is not None


def _data_files(table_dir: str) -> list[str]:
    """Spark-written part files of one table dump, deterministic order;
    sidecar stamps (_SUCCESS, _SCHEMA_SEQUENCE, .crc) are not data."""
    return sorted(
        f
        for f in os.listdir(table_dir)
        if not f.startswith(("_", "."))
        and os.path.isfile(os.path.join(table_dir, f))
    )


def package_dump_archive(
    dump_root: str,
    archive_path: str,
    tables: list[str],
    *,
    schema_version: int = SCHEMA_VERSION,
    time_now: datetime | None = None,
    partitioned_tables: tuple[str, ...] = DEFAULT_PARTITIONED_TABLES,
    threads: int | None = None,
) -> list[str]:
    """Package per-table dump directories under ``dump_root`` into the
    reference's ``.tar.zst`` container; returns the member names in the
    order written (db/dump.py:968-1013 layout, stamps first).

    ``tables`` fixes the member order (the reference enumerates tables
    explicitly, db/dump.py:311-386).  Tables in ``partitioned_tables`` keep
    one numbered member per Spark part file — ``maxRecordsPerFile`` already
    performed the reference's ROWS_PER_FILE split — while other tables are
    concatenated to the reference's single member per table (those are its
    small tables).  Concatenation requires same-codec parts with no
    embedded header rows (gzip members concatenate losslessly per RFC 1952;
    the TSV writers here emit header-per-file, so single-member tables must
    be written headerless or single-part).
    """
    time_now = time_now or datetime.utcnow()
    archive_name = os.path.basename(archive_path).split(".")[0]
    members: list[str] = []

    os.makedirs(os.path.dirname(archive_path) or ".", exist_ok=True)
    use_zstd = _zstd_available() and archive_path.endswith(".zst")
    archive = open(archive_path, "wb")
    zstd = None
    if use_zstd:
        cmd = ["zstd", "--compress", "-10"]  # db/dump.py:539, 629-634
        if threads is not None:
            cmd.append(f"-T{threads}")
        zstd = subprocess.Popen(cmd, stdin=subprocess.PIPE, stdout=archive)
        sink = zstd.stdin
    else:
        sink = archive

    def _add_bytes(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
        import io

        info = tarfile.TarInfo(name)
        info.size = len(payload)
        info.mtime = int(time_now.timestamp())
        tar.addfile(info, io.BytesIO(payload))
        members.append(name)

    def _add_file(tar: tarfile.TarFile, name: str, path: str) -> None:
        tar.add(path, arcname=name)
        members.append(name)

    try:
        # streaming mode, like the reference's tarfile.open(mode="w|")
        with tarfile.open(fileobj=sink, mode="w|") as tar:
            _add_bytes(
                tar,
                os.path.join(archive_name, "SCHEMA_SEQUENCE"),
                f"{schema_version}".encode(),
            )
            _add_bytes(
                tar,
                os.path.join(archive_name, "TIMESTAMP"),
                time_now.isoformat(" ").encode(),
            )
            _add_bytes(
                tar, os.path.join(archive_name, "COPYING"), LICENSE_TEXT.encode()
            )
            for table in tables:
                table_dir = os.path.join(dump_root, table)
                parts = _data_files(table_dir)
                if table in partitioned_tables:
                    # db/dump.py:203-240: <table>/<table>-<N>, N from 1
                    for n, part in enumerate(parts, start=1):
                        _add_file(
                            tar,
                            os.path.join(archive_name, "abdump", table, f"{table}-{n}"),
                            os.path.join(table_dir, part),
                        )
                else:
                    # db/dump.py:254-260: one member per small table
                    payload = b"".join(
                        open(os.path.join(table_dir, p), "rb").read() for p in parts
                    )
                    _add_bytes(
                        tar, os.path.join(archive_name, "abdump", table), payload
                    )
    finally:
        if zstd is not None:
            zstd.stdin.close()
            zstd.wait()
            if zstd.returncode:
                raise RuntimeError(f"zstd exited {zstd.returncode}")
        archive.close()
    return members


_GZIP_MAGIC = b"\x1f\x8b"


def read_dump_archive(
    archive_path: str,
    extract_dir: str,
    *,
    expected_schema_version: int = SCHEMA_VERSION,
) -> dict[str, object]:
    """Stream a dump archive back to per-table local directories Spark can
    read (db/dump.py:449-497 import protocol).

    Verifies the SCHEMA_SEQUENCE stamp against ``expected_schema_version``
    (raises on mismatch, db/dump.py:464-470) and asserts ascending file
    numbers for split tables (db/dump.py:480-484).  Extracted data files
    keep a codec-correct extension (gzip magic sniff) so ``spark.read``
    decompresses them; returns ``{"timestamp": str|None, "tables":
    {table: dir}}``.
    """
    if _zstd_available() and archive_path.endswith(".zst"):
        zstd = subprocess.Popen(
            ["zstd", "--decompress", "--stdout", archive_path],
            stdout=subprocess.PIPE,
        )
        stream, closer = zstd.stdout, zstd
    else:
        stream, closer = open(archive_path, "rb"), None

    os.makedirs(extract_dir, exist_ok=True)
    tables: dict[str, str] = {}
    timestamp: str | None = None
    schema_checked = False
    last_file_num: dict[str, int] = {}
    try:
        with tarfile.open(fileobj=stream, mode="r|") as tar:
            for member in tar:
                if not member.isfile():
                    continue
                rel = member.name.split("/")
                base = rel[-1]
                if base == "SCHEMA_SEQUENCE":
                    got = int(tar.extractfile(member).read().strip())
                    if got != expected_schema_version:
                        raise ValueError(
                            f"Incorrect schema version! Expected: "
                            f"{expected_schema_version}, got: {got}. "
                            "Please, get the latest version of the dump."
                        )
                    schema_checked = True
                    continue
                if base == "TIMESTAMP":
                    timestamp = tar.extractfile(member).read().decode()
                    continue
                if base == "COPYING":
                    continue
                # data member: <archive>/abdump/<table>[/<table>-<N>]
                if len(rel) >= 4:
                    table, fname = rel[-2], rel[-1]
                    file_num = int(fname.rsplit("-", 1)[-1])
                    if last_file_num.get(table, 0) >= file_num:
                        raise ValueError(
                            f"out-of-order split member {member.name} for {table}"
                        )
                    last_file_num[table] = file_num
                else:
                    table, fname = rel[-1], rel[-1]
                payload = tar.extractfile(member).read()
                ext = ".gz" if payload[:2] == _GZIP_MAGIC else ""
                tdir = os.path.join(extract_dir, table)
                os.makedirs(tdir, exist_ok=True)
                with open(os.path.join(tdir, fname + ext), "wb") as f:
                    f.write(payload)
                tables[table] = tdir
    finally:
        if closer is not None:
            closer.stdout.close()
            closer.wait()
        else:
            stream.close()
    if not schema_checked:
        raise ValueError("archive has no SCHEMA_SEQUENCE member")
    return {"timestamp": timestamp, "tables": tables}
