"""Per-query Spark-vs-DuckDB ratio artifact (r5 verdict item #6).

Merges Spark timings (cold + warm, either from an existing ``BENCH_r*.json``
/ ``bench.py`` output passed as ``--bench FILE`` or measured fresh by running
``bench.py``'s protocol) with best-of-2 DuckDB oracle timings over the same
parquet tables, and writes ``BENCHRATIO.json``:

    {"sf": 0.1,
     "queries": {"q": {"warm": s, "cold": s, "duck": s, "ratio": warm/duck}},
     "totals": {...},
     "worst": [[q, ratio], ...]}   # compute-bound tail, ratio desc

``ratio`` is warm-Spark / DuckDB — the number the 2x audit reads.  Queries
without a SQL oracle (streaming, committed-model pipelines) get duck=null and
no ratio.  Usage:

    python tools/bench_ratio.py [sf_dir] [--bench BENCH.json] [--out FILE]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from acousticbrainz_server_spark.plans.registry import QUERIES, _load_all
from acousticbrainz_server_spark.sources.tables import TESTDATA_TABLES


def duck_times(sf_dir: str, runs: int = 2) -> dict[str, float]:
    """Best-of-N DuckDB wall time per oracle, full materialization."""
    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out: dict[str, float] = {}
    for name, spec in sorted(QUERIES.items()):
        if spec.oracle is None:
            continue
        best = None
        for _ in range(runs):
            t0 = time.time()
            con.execute(spec.oracle).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:]]
    bench_file = None
    out_file = "BENCHRATIO.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    i = 0
    while i < len(args):
        if args[i] == "--bench":
            bench_file = args[i + 1]
            i += 2
        elif args[i] == "--out":
            out_file = args[i + 1]
            i += 2
        else:
            sf_dir = args[i]
            i += 1

    _load_all()

    if bench_file:
        bench = json.load(open(bench_file))
    else:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        proc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
            capture_output=True,
            text=True,
            env=env,
        )
        bench = json.loads(proc.stdout.strip().splitlines()[-1])

    warm = bench["queries"]
    cold = bench.get("queries_cold", {})
    duck = duck_times(sf_dir)

    queries: dict[str, dict] = {}
    for name in sorted(QUERIES):
        w = warm.get(name)
        d = duck.get(name)
        entry = {
            "warm": w,
            "cold": cold.get(name),
            "duck": d,
            "ratio": round(w / d, 2) if w is not None and w >= 0 and d else None,
        }
        queries[name] = entry

    ratios = [(n, q["ratio"]) for n, q in queries.items() if q["ratio"] is not None]
    worst = sorted(ratios, key=lambda kv: -kv[1])[:15]
    total_warm = round(sum(q["warm"] for q in queries.values() if q["warm"] and q["warm"] > 0), 3)
    total_duck = round(sum(q["duck"] for q in queries.values() if q["duck"]), 3)
    result = {
        "sf": bench.get("sf"),
        "totals": {
            "spark_warm": total_warm,
            "spark_cold": bench.get("value_cold"),
            "duck": total_duck,
            "suite_ratio": round(total_warm / total_duck, 3) if total_duck else None,
        },
        # compute-bound tail: warm >= 1s AND >2x duck (fixed-overhead
        # sub-second queries are scheduling floor, not plan defects)
        "tail_over_2x": [
            [n, r]
            for n, r in worst
            if r > 2.0 and queries[n]["warm"] and queries[n]["warm"] >= 1.0
        ],
        "worst": worst,
        "queries": queries,
    }
    with open(out_file, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"out": out_file, "totals": result["totals"], "tail_over_2x": result["tail_over_2x"]}))


if __name__ == "__main__":
    main()
