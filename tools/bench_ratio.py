"""Per-query Spark-vs-DuckDB ratio artifact (r5 verdict item #6).

Merges Spark timings (cold + warm, either from an existing ``BENCH_r*.json``
/ ``bench.py`` output passed as ``--bench FILE`` or measured fresh by running
``bench.py``'s protocol) with best-of-3 DuckDB oracle timings over the same
parquet tables, and writes ``BENCHRATIO.json``:

    {"sf": 0.1,
     "queries": {"q": {"warm": s, "cold": s, "duck": s, "ratio": warm/duck}},
     "totals": {...},
     "guards": {...},              # exchange-bound class: numeric ceilings
     "worst": [[q, ratio], ...]}   # compute-bound tail, ratio desc

``ratio`` is warm-Spark / DuckDB — the number the 2x audit reads.  Queries
without a SQL oracle (streaming, committed-model pipelines) get duck=null and
no ratio.  Usage:

    python tools/bench_ratio.py [sf_dir] [--bench BENCH.json ...] [--draws N] [--out FILE]

Min-over-draws doctrine (r8 verdict): pass ``--bench`` several times (one
per measured draw) and/or ``--draws N`` to run bench.py N times; per-query
warm is the MIN across draws, so one contended window cannot inflate the
committed per-query ratios.
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

# Exchange-bound acceptance, made EXECUTABLE (r8 verdict #2).  These six
# queries are formally accepted >2x-vs-DuckDB constants: linear in data, no
# superlinear stage, no collect, no skew cliff — the gap is exchange
# serialization a fused single-process engine never pays (SCALE.md).  A
# breach prints here and lands in the artifact's "guards" block — visible
# without reading SCALE.md prose.
#
# Anchors + derived ceilings (r11, replacing hand-written constants): the
# anchors are the r10 COMMITTED min-over-6-draws warm times and their
# warm/duck ratios from the committed BENCHRATIO.json (commit 4924b62).
# Both ceilings AND the doctrine string emitted into the artifact are
# derived from the same constants below, so the artifact's self-description
# can no longer drift from how it was produced (r10 ADVICE).  The r8-anchored
# absolute ceilings had gone permanently unsatisfiable after ~13% of
# cumulative box drift (abc_analysis min 1.649 vs ceiling 1.60) — re-based
# once per the r10 verdict so pass_abs regains meaning on a quiet draw.
GUARD_ANCHOR = "r10 committed BENCHRATIO min-over-6-draws"
GUARD_ABS_MARGIN = 1.25  # +25% over the anchor warm min (same policy as r8)
# Ratio margin must cover the DuckDB denominator's OWN window-to-window
# spread: these sub-0.2 s oracles vary ±50% across windows (observed r10:
# abc_analysis duck 0.073–0.144), so a narrower margin would flag pure
# duck-draw luck as a regression.
GUARD_RATIO_MARGIN = 1.50
# Load-evidence gate for the ratio fallback (r10 ADVICE, medium): the warm
# min comes from earlier bench draws while DuckDB is measured in THIS
# tool's later window — numerator and denominator are NOT load-correlated,
# so the ratio bound must not silently forgive a quiet-draw regression
# whenever the duck draw happens to land slow.  The fallback therefore only
# applies when the min draw itself shows load: 1-min loadavg at draw start
# >= this threshold (quiet draws on the 32-cpu box start at 0.3–1.1;
# contended ones at 4+).  A draw without recorded loadavg gets no fallback.
# Known permissiveness: in a back-to-back multi-draw session every draw
# after the first inherits the previous draw's own residual loadavg (~5 on
# this box), so the fallback is available to those draws even when nothing
# external ran.  That errs on the forgiving side for draws 2..N while
# staying strict where it matters most — the first-in-session draw on a
# genuinely quiet box, where pass_abs must hold by itself.
GUARD_LOAD_THRESHOLD = 2.0
GUARD_ANCHORS_SF01 = {
    # name: (anchor warm-min seconds, anchor warm/duck ratio)
    "pmi_copurchase": (1.271, 9.01),
    "degree_distribution": (1.430, 3.85),
    "abc_analysis": (1.649, 17.00),
    "slow_fulfillment_suppliers": (1.346, 9.48),
    "fk_integrity_audit": (1.795, 27.62),
    "dominant_part_suppliers": (1.156, 11.45),
}
EXCHANGE_BOUND_CEILINGS_SF01 = {
    n: round(w * GUARD_ABS_MARGIN, 2) for n, (w, _r) in GUARD_ANCHORS_SF01.items()
}
EXCHANGE_BOUND_RATIO_CEILINGS_SF01 = {
    n: round(r * GUARD_RATIO_MARGIN, 1) for n, (_w, r) in GUARD_ANCHORS_SF01.items()
}


def duck_times(sf_dir: str, runs: int = 3) -> dict[str, float]:
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
    bench_files: list[str] = []
    draws = 0
    out_file = "BENCHRATIO.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    i = 0
    while i < len(args):
        if args[i] == "--bench":
            bench_files.append(args[i + 1])
            i += 2
        elif args[i] == "--draws":
            draws = int(args[i + 1])
            i += 2
        elif args[i] == "--out":
            out_file = args[i + 1]
            i += 2
        else:
            sf_dir = args[i]
            i += 1

    _load_all()

    benches: list[dict] = [json.load(open(f)) for f in bench_files]
    for _ in range(max(draws, 0 if benches else 1)):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        proc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
            capture_output=True,
            text=True,
            env=env,
        )
        benches.append(json.loads(proc.stdout.strip().splitlines()[-1]))

    bench = benches[0]
    # min-over-draws is only meaningful over draws of ONE scale — refuse to
    # silently mix sf0.1 and sf1 warm times into the same artifact, and the
    # draws must match the sf_dir the DuckDB denominators are measured on
    sfs = {b.get("sf") for b in benches}
    if len(sfs) > 1:
        raise SystemExit(
            f"--bench files were measured at different sfs: {sorted(sfs, key=repr)}"
        )
    # infer sf from the dir basename ('sf0.1' -> 0.1); an unconventional
    # layout is a warning + skipped mismatch check, never a crash or a
    # false NaN != x failure (NaN is unequal to everything)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf_dir_sf = float(base.removeprefix("sf")) if base.startswith("sf") else None
    except ValueError:
        sf_dir_sf = None
    if sf_dir_sf is not None and sf_dir_sf != sf_dir_sf:  # NaN (basename 'sf')
        sf_dir_sf = None
    bench_sf = next(iter(sfs))
    if sf_dir_sf is None:
        print(
            f"warning: cannot infer sf from sf_dir {sf_dir!r}; "
            "skipping the bench-sf/oracle-sf mismatch check",
            file=sys.stderr,
        )
    elif bench_sf is not None and bench_sf != sf_dir_sf:
        raise SystemExit(
            f"--bench files are sf={bench_sf} but oracle timings would run on "
            f"{sf_dir} (sf={sf_dir_sf}) — ratios would mix scales"
        )
    # min over draws, per query: one contended window cannot inflate ratios
    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    warm_draw: dict[str, int] = {}  # which draw supplied each min (provenance)
    for di, b in enumerate(benches):
        for n, v in b["queries"].items():
            if v is not None and v >= 0 and (n not in warm or v < warm[n]):
                warm[n] = v
                warm_draw[n] = di
        for n, v in b.get("queries_cold", {}).items():
            if v is not None and v >= 0 and (n not in cold or v < cold[n]):
                cold[n] = v
    duck_t0 = time.time()
    duck = duck_times(sf_dir)
    duck_meta = {
        "t_start": round(duck_t0, 1),
        "t_end": round(time.time(), 1),
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }

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

    # executable acceptance guards for the exchange-bound class — the
    # ceilings are sf0.1 numbers, so they only assert on sf0.1 artifacts
    # (a missing warm entry AT sf0.1 is a loud failure: the query errored)
    guards_applicable = bench.get("sf") == 0.1
    guards = {}
    for n, ceiling in EXCHANGE_BOUND_CEILINGS_SF01.items():
        w = warm.get(n)
        d = duck.get(n)
        rc = EXCHANGE_BOUND_RATIO_CEILINGS_SF01[n]
        ratio = round(w / d, 2) if w is not None and w >= 0 and d else None
        abs_ok = w is not None and w <= ceiling
        # load evidence for the min draw that supplied this query's warm time
        di = warm_draw.get(n)
        la = None
        if di is not None and di < len(benches):
            las = benches[di].get("loadavg_start")
            la = las[0] if isinstance(las, (list, tuple)) and las else None
        load_evidence = la is not None and la >= GUARD_LOAD_THRESHOLD
        ratio_ok = ratio is not None and ratio <= rc and load_evidence
        guards[n] = {
            "warm": w,
            "ceiling": ceiling,
            "ratio_vs_duck": ratio,
            "ratio_ceiling": rc,
            "min_draw": warm_draw.get(n),
            "min_draw_loadavg1": la,
            "load_evidence": load_evidence,
            "pass_abs": abs_ok if guards_applicable else None,
            "pass_ratio": ratio_ok if guards_applicable else None,
            # verdict: the absolute bound is the primary acceptance; the
            # ratio bound only forgives a breach on a demonstrably-loaded
            # min draw.  A real plan regression breaches abs on a quiet
            # draw and gets no fallback.
            "pass": (abs_ok or ratio_ok) if guards_applicable else None,
        }
    guards_pass = (
        all(g["pass"] for g in guards.values()) if guards_applicable else None
    )
    # per-draw provenance so a breach is diagnosable from the artifact alone
    draw_meta = [
        {
            "source": (bench_files[di] if di < len(bench_files) else "fresh"),
            "sf": b.get("sf"),
            "total_warm": b.get("value"),
            "t_start": b.get("t_start"),
            "t_end": b.get("t_end"),
            "loadavg_start": b.get("loadavg_start"),
            "loadavg_end": b.get("loadavg_end"),
        }
        for di, b in enumerate(benches)
    ]

    result = {
        "sf": bench.get("sf"),
        "draws": len(benches),
        "totals": {
            "spark_warm": total_warm,
            # cold total from the same min-over-draws doctrine as warm,
            # summed over REGISTERED queries only (mirrors total_warm), so
            # the committed total agrees with the per-query cold fields even
            # when a --bench file carries since-renamed query names
            "spark_cold": (
                round(sum(v for n, v in cold.items() if n in QUERIES), 3)
                if cold
                else bench.get("value_cold")
            ),
            "duck": total_duck,
            "suite_ratio": round(total_warm / total_duck, 3) if total_duck else None,
        },
        "guards": {
            # derived from the same constants as the ceilings — cannot drift
            "doctrine": (
                f"exchange-bound class: pass = min-over-draws warm sf0.1 <= "
                f"absolute ceiling ({GUARD_ANCHOR} x{GUARD_ABS_MARGIN}) OR, only "
                f"when the min draw shows load evidence (1-min loadavg_start >= "
                f"{GUARD_LOAD_THRESHOLD}), warm/DuckDB <= ratio ceiling (anchor "
                f"ratio x{GUARD_RATIO_MARGIN}). DuckDB is measured in this "
                f"tool's own later window, NOT load-correlated with the warm "
                f"min — hence the load gate on the fallback. A real plan "
                f"regression breaches the absolute bound on a quiet draw. "
                f"Applicable only at sf0.1 (pass=null otherwise). "
                f"draw_meta/duck_meta give the measurement windows."
            ),
            "applicable": guards_applicable,
            "pass": guards_pass,
            "n_draws": len(benches),
            "draw_meta": draw_meta,
            "duck_meta": duck_meta,
            "queries": guards,
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
    print(
        json.dumps(
            {
                "out": out_file,
                "draws": len(benches),
                "totals": result["totals"],
                "guards_pass": guards_pass,
                "guard_breaches": [
                    n for n, g in guards.items() if g["pass"] is False
                ],
                "tail_over_2x": result["tail_over_2x"],
            }
        )
    )


if __name__ == "__main__":
    main()
