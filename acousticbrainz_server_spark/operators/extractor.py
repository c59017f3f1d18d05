"""External-binary highlevel extraction stage (SURVEY.md §2.1 S11, §2.10 M1).

The reference runs ``essentia_streaming_extractor_music_svm`` over temp JSON
files, ≤20 docs per process call, from a 2-thread polling daemon
(hl_extractor/hl_calc.py:20-32, 50-129, 183-231).  Spark-first: the binary is
a black-box row-map → ``mapInPandas`` with the Arrow batch size pinned to the
reference's per-process chunk, parallelism = partitions (the daemon's thread
pool generalizes to the cluster for free).

The binary itself is not in this container, so the subprocess kernel is
STUBBED: ``run_extractor_binary`` raises NotImplementedError with the exact
invocation contract, and ``fake_extractor`` is a deterministic drop-in
(md5-derived probabilities) used by tests and the fixture generator's
highlevel stage.  The Spark-side plumbing — schema, batching, partitioning —
is real and tested.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import MODEL_CLASSES

MAX_ITEMS_PER_PROCESS = 20  # hl_calc.py:32
DOCUMENTS_PER_QUERY = 100  # hl_calc.py:30

# One output row per (submission, model): the highlevel_model-shaped result.
EXTRACTOR_OUTPUT_SCHEMA = (
    "id long, model string, all_probs map<string,double>, value string, probability double"
)

ExtractorFn = Callable[[list[dict]], list[dict]]
"""Takes a batch of ≤MAX_ITEMS_PER_PROCESS docs [{'id': .., 'doc_json': ..}],
returns rows [{'id', 'model', 'all_probs', 'value', 'probability'}]."""


def run_extractor_binary(docs: list[dict]) -> list[dict]:
    """Invoke the real Essentia SVM binary (hl_calc.py:50-129): write each
    doc_json to a temp file, exec the binary over ≤20 files, parse the JSON
    outputs.  Not available in this environment."""
    raise NotImplementedError(
        "essentia_streaming_extractor_music_svm is not installed; pass "
        "extractor=fake_extractor or a subprocess-backed callable"
    )


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
