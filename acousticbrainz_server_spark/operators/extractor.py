"""External-binary highlevel extraction stage (SURVEY.md §2.1 S11, §2.10 M1).

The reference runs ``essentia_streaming_extractor_music_svm`` over temp JSON
files, ≤20 docs per process call, from a 2-thread polling daemon
(hl_extractor/hl_calc.py:20-32, 50-129, 183-231).  Spark-first: the binary is
a black-box row-map → ``mapInPandas`` with the Arrow batch size pinned to the
reference's per-process chunk, parallelism = partitions (the daemon's thread
pool generalizes to the cluster for free).

The subprocess kernel (``subprocess_extractor``) is the REAL temp-file →
exec → parse loop of the reference (hl_calc.py:50-129), with a pluggable
argv so tests drive it end-to-end with a stand-in script; the Essentia
binary itself is not in this container, so ``run_extractor_binary`` raises
NotImplementedError unless the binary exists at its installed path.
``fake_extractor`` remains the in-process deterministic drop-in
(md5-derived probabilities) used by fast tests and the fixture generator's
highlevel stage.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import tempfile
from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import MODEL_CLASSES

MAX_ITEMS_PER_PROCESS = 20  # hl_calc.py:32
DOCUMENTS_PER_QUERY = 100  # hl_calc.py:30
HIGH_LEVEL_EXTRACTOR_BINARY = "/usr/local/bin/essentia_streaming_extractor_music_svm"  # hl_calc.py:25

# One output row per (submission, model): the highlevel_model-shaped result.
EXTRACTOR_OUTPUT_SCHEMA = (
    "id long, model string, all_probs map<string,double>, value string, probability double"
)

ExtractorFn = Callable[[list[dict]], list[dict]]
"""Takes a batch of ≤MAX_ITEMS_PER_PROCESS docs [{'id': .., 'doc_json': ..}],
returns rows [{'id', 'model', 'all_probs', 'value', 'probability'}]."""


def parse_highlevel_output(rowid: int, hl_data: dict) -> list[dict]:
    """Binary output document -> highlevel_model-shaped rows.

    The reference stores one row per (submission, model) from the binary's
    ``highlevel`` block (db/data.py:480-498 shape); an empty/failed document
    (the reference's empty-dict sentinel, hl_calc.py:113-117) yields no rows.
    """
    rows = []
    for model, result in sorted((hl_data.get("highlevel") or {}).items()):
        prob = result.get("probability")
        rows.append(
            {
                "id": rowid,
                "model": model,
                "all_probs": {k: float(v) for k, v in (result.get("all") or {}).items()},
                "value": result.get("value"),
                "probability": float(prob) if prob is not None else None,
            }
        )
    return rows


def subprocess_extractor(
    argv: Sequence[str],
    trailing_args: Sequence[str] = (),
    timeout: float | None = None,
) -> ExtractorFn:
    """The reference's subprocess kernel (hl_calc.py:50-129) with pluggable
    argv: write each doc to ``<id>-input.json`` in a temp dir, exec
    ``argv + [in1, out1, in2, out2, ...] + trailing_args`` (the reference
    appends its profile.conf the same way, hl_calc.py:108-110), then parse
    each ``<id>-output.json``; a missing/invalid output file contributes an
    empty result for that doc, exactly like the reference's IOError path.
    """

    def run(docs: list[dict]) -> list[dict]:
        if len(docs) > MAX_ITEMS_PER_PROCESS:
            raise ValueError(f"'docs' cannot contain more than {MAX_ITEMS_PER_PROCESS} items")
        if not docs:
            raise ValueError("'docs' must have some items")
        working_dir = tempfile.mkdtemp(prefix="hlcalc")
        try:
            call_args = list(argv)
            n_written = 0
            for d in docs:
                in_path = os.path.join(working_dir, f"{d['id']}-input.json")
                out_path = os.path.join(working_dir, f"{d['id']}-output.json")
                try:
                    with open(in_path, "w", encoding="utf-8") as fp:
                        fp.write(d["doc_json"])
                    call_args.extend([in_path, out_path])
                    n_written += 1
                except OSError:
                    pass  # unwritten doc -> no output file -> empty result below
            if n_written == 0:
                raise RuntimeError("Unable to write any lowlevel files to temporary directory")
            call_args.extend(trailing_args)
            with open(os.devnull, "w") as fnull:
                subprocess.check_call(call_args, stdout=fnull, stderr=fnull, timeout=timeout)
            rows: list[dict] = []
            for d in docs:
                try:
                    with open(os.path.join(working_dir, f"{d['id']}-output.json")) as fp:
                        hl_data = json.load(fp)
                except (OSError, ValueError):
                    hl_data = {}
                rows.extend(parse_highlevel_output(d["id"], hl_data))
            return rows
        finally:
            shutil.rmtree(working_dir, ignore_errors=True)

    return run


def run_extractor_binary(docs: list[dict]) -> list[dict]:
    """Invoke the real Essentia SVM binary (hl_calc.py:50-129) via the
    subprocess kernel.  The binary is not in this container; tests exercise
    the identical kernel through ``subprocess_extractor`` with a stand-in."""
    if not os.path.exists(HIGH_LEVEL_EXTRACTOR_BINARY):
        raise NotImplementedError(
            "essentia_streaming_extractor_music_svm is not installed; pass "
            "extractor=fake_extractor or subprocess_extractor(argv)"
        )
    return subprocess_extractor([HIGH_LEVEL_EXTRACTOR_BINARY])(docs)


def fake_extractor(docs: list[dict]) -> list[dict]:
    """Deterministic stand-in: per (id, model), md5-seeded probabilities over
    the model's class set (mirrors the reference tests' mocked binary)."""
    out = []
    for d in docs:
        for model, classes in sorted(MODEL_CLASSES.items()):
            seed = hashlib.md5(f"{d['id']}|{model}".encode()).digest()
            raw = [(seed[i % 16] + 1) * (i + 1) for i in range(len(classes))]
            total = float(sum(raw))
            probs = {c: round(v / total, 6) for c, v in zip(classes, raw)}
            value = max(probs, key=lambda c: (probs[c], c))
            out.append(
                {"id": d["id"], "model": model, "all_probs": probs, "value": value, "probability": probs[value]}
            )
    return out


def extract_highlevel(
    lowlevel_json_new: DataFrame,
    extractor: ExtractorFn = run_extractor_binary,
    items_per_call: int = MAX_ITEMS_PER_PROCESS,
) -> DataFrame:
    """Run the extractor over new submissions (typically the J4 anti-join
    output), one subprocess call per ≤items_per_call docs per partition.

    Returns highlevel_model-shaped rows; callers join model names back to
    model ids and append to the highlevel/highlevel_meta/highlevel_model
    tables (db/data.py:291-417 write path).
    """
    src = lowlevel_json_new.select(
        "id", F.to_json(F.col("data"), {"ignoreNullFields": "false"}).alias("doc_json")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[dict] = []

        def flush():
            if not buf:
                return None
            rows = extractor(buf)
            buf.clear()
            return pd.DataFrame(rows)

        for pdf in batches:
            for rec in pdf.to_dict("records"):
                buf.append(rec)
                if len(buf) >= items_per_call:
                    out = flush()
                    if out is not None:
                        yield out
        out = flush()
        if out is not None:
            yield out

    return src.mapInPandas(run, schema=EXTRACTOR_OUTPUT_SCHEMA)
