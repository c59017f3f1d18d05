"""Physical-plan assertions: the optimizations the engine's scale story
depends on must actually appear in the executed plans.

- filter pushdown reaches the parquet scan (PushedFilters),
- column pruning (ReadSchema carries only selected columns),
- nested-schema pruning on the document table (only touched subfields read),
- small dims / key sets join as broadcasts, not shuffles,
- aggregations are partial (map-side combine) before the exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acousticbrainz_server_spark.plans.registry import QUERIES, _load_all
from acousticbrainz_server_spark.sources.fixtures import generate_fixture_tables
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module", autouse=True)
def _load():
    _load_all()


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["pricing_summary"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark):
    df = QUERIES["count_per_key"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    # only user_id should be read from the events scan
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "user_id" in read_schema and "props" not in read_schema and "value" not in read_schema


def test_broadcast_joins_for_dims_and_keysets(spark):
    for name in ("join_multiway_rollup", "point_lookup_batch", "knn_exact_topk"):
        plan = _plan(QUERIES[name].spark_fn(spark, SF_SMOKE))
        assert "Broadcast" in plan, f"{name} should broadcast its small side"
    # the multiway rollup must NOT shuffle nation/region
    plan = _plan(QUERIES["join_multiway_rollup"].spark_fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_partial_aggregation(spark):
    plan = _plan(QUERIES["count_distinct_split"].spark_fn(spark, SF_SMOKE))
    # map-side partial_count before the exchange
    assert "partial_count" in plan


def test_nested_schema_pruning(spark):
    tables = generate_fixture_tables(spark, n_lowlevel=50, n_gids=30)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tables["lowlevel_json"].write.mode("overwrite").parquet(d + "/llj")
        llj = spark.read.parquet(d + "/llj")
        proj = llj.select("id", F.col("data.rhythm.bpm").alias("bpm"))
        plan = _plan(proj)
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        # only rhythm.bpm must be read from the document struct
        assert "bpm" in read_schema
        assert "mfcc" not in read_schema and "tags" not in read_schema, read_schema


def test_anti_join_strategy(spark):
    plan = _plan(QUERIES["anti_join_unprocessed"].spark_fn(spark, SF_SMOKE))
    assert "LeftAnti" in plan


def test_window_group_limit_pushdown(spark):
    # Spark 3.5+ pushes row_number()<=k limits before the full sort
    plan = _plan(QUERIES["topk_per_group"].spark_fn(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan


def test_global_topk_avoids_full_sort(spark):
    # orderBy().limit() must compile to TakeOrderedAndProject, not a full sort
    plan = _plan(QUERIES["shipping_priority_topk"].spark_fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_q17_brand_filter_pushed_below_aggregate(spark):
    # the brand restriction must reach both lineitem branches as a broadcast
    # semi-join BEFORE the per-part average, and no shuffle of the part dim
    plan = _plan(QUERIES["small_quantity_revenue"].spark_fn(spark, SF_SMOKE))
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_ordered_lookup_never_shuffles_big_side(spark):
    # the request is a LocalTableScan; all joins are broadcast — a shuffle of
    # the fact table for a 7-key lookup would be catastrophic at scale
    plan = _plan(QUERIES["ordered_lookup"].spark_fn(spark, SF_SMOKE))
    assert "LocalTableScan" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_document_chunks_window_semantics(spark):
    # 50 tokens, W=32/S=24: chunk 0 covers 1..32, chunk 1 covers 25..50
    # (26 tokens, adds 18 new); a start at 48 would add only 2 <= overlap
    # tokens and must be dropped
    text = " ".join(f"t{i}" for i in range(1, 51))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(d + "/documents.parquet")
        out = QUERIES["document_chunks"].spark_fn(spark, d).collect()
    by_idx = {r["chunk_idx"]: r for r in out}
    assert set(by_idx) == {0, 1}
    assert by_idx[0]["n_chunk_tokens"] == 32
    assert by_idx[0]["chunk_text"].startswith("t1 ") and by_idx[0]["chunk_text"].endswith(" t32")
    assert by_idx[1]["n_chunk_tokens"] == 26
    assert by_idx[1]["chunk_text"].startswith("t25 ") and by_idx[1]["chunk_text"].endswith(" t50")


def test_pii_redact_behavior(spark):
    # the synthetic corpus has no PII, so prove behavior on crafted rows
    import tempfile

    rows = [
        (1, "mail bob@example.com and carol@sub.test.org now", "en", "s", 1),
        (2, "server at 10.0.255.3 responded", "en", "s", 1),
        (3, "call +1 415 555 0100 today", "en", "s", 1),
        (4, "nothing sensitive here", "en", "s", 1),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(d + "/documents.parquet")
        out = {r["doc_id"]: r for r in QUERIES["pii_redact"].spark_fn(spark, d).collect()}
    assert out[1]["clean_text"] == "mail <EMAIL> and <EMAIL> now" and out[1]["n_emails"] == 2
    assert out[2]["clean_text"] == "server at <IP> responded" and out[2]["n_ips"] == 1
    assert out[3]["clean_text"] == "call <PHONE> today"
    assert out[4]["clean_text"] == "nothing sensitive here"


def test_tfidf_no_forced_broadcast_and_group_limits(spark):
    # the document-frequency relation is vocabulary-sized (unbounded at web
    # scale) so the tf-df join must NOT carry a broadcast hint — AQE picks the
    # strategy at runtime; N folds in as a plan-side 1-row aggregate whose
    # crossJoin IS broadcast (the only sanctioned hint in this plan); the
    # top-3 ranking must push a WindowGroupLimit below the full sort
    df = QUERIES["tfidf_top_terms"].spark_fn(spark, SF_SMOKE)
    optimized = _optimized(df)
    hinted = [l for l in optimized.splitlines() if "hint" in l.lower()]
    assert len(hinted) == 1 and "Join Cross" in hinted[0], hinted  # the 1-row N scalar only
    inner = [l for l in optimized.splitlines() if "Join Inner" in l]
    assert inner and all("hint" not in l.lower() for l in inner), inner  # tf-df join unhinted
    plan = _plan(df)
    assert "WindowGroupLimit" in plan


def test_document_chunks_prunes_scan(spark):
    # chunking reads exactly (doc_id, text) — not lang/source/n_chars
    plan = _plan(QUERIES["document_chunks"].spark_fn(spark, SF_SMOKE))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_asof_join_single_shuffle(spark):
    # the union-and-carry as-of join must contain exactly ONE exchange over
    # the unioned stream (the window's key partitioning) — a range-join or
    # per-row lateral encoding would show joins/extra exchanges
    plan = _plan(QUERIES["asof_latest_purchase"].spark_fn(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_sessionize_single_shuffle(spark):
    # lag-flag window, running-sum window, and the final groupBy all share
    # the user_id partitioning: one exchange total
    plan = _plan(QUERIES["sessionize_events"].spark_fn(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_corpus_filter_duplicate_gate(spark):
    # the synthetic corpus has no exact dups, so prove the duplicate gate
    # (and reason precedence: duplicate wins over quality/lang) on crafted rows
    import tempfile

    rows = [
        (1, "the of and to in is the of and to", "en", "s", 1),  # canonical, likely keep
        (2, "the of and to in is the of and to", "en", "s", 1),  # exact dup of 1
        (3, "zz", "en", "s", 1),  # too short -> low quality
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(d + "/documents.parquet")
        out = {r["doc_id"]: r for r in QUERIES["corpus_filter"].spark_fn(spark, d).collect()}
    assert out[2]["keep"] is False and out[2]["drop_reason"] == "duplicate"
    assert out[3]["keep"] is False and out[3]["drop_reason"] == "low_quality"
    assert out[1]["drop_reason"] in (None, "lang_mismatch")  # never 'duplicate'


def test_time_partitioned_layout_prunes(spark, tmp_path):
    """The month-partitioned layout must (a) round-trip, (b) show partition
    pruning in the scan (PartitionFilters on p_month, not a row filter), and
    (c) read strictly fewer files for a narrow window."""
    from acousticbrainz_server_spark.sources.layout import (
        read_time_range,
        write_time_partitioned,
    )
    from acousticbrainz_server_spark.sources.tables import load_table

    # spread the single-month testdata over three months so pruning is
    # observable (shift by user_id % 3 months)
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts", F.expr("timestampadd(MONTH, CAST(user_id % 3 AS INT), ts)")
    )
    out = str(tmp_path / "events_part")
    write_time_partitioned(ev, out, ts_col="ts", sort_col="user_id")

    full = spark.read.parquet(out)
    assert full.count() == ev.count()

    jan = read_time_range(spark, out, "2024-01", "2024-01")
    plan = _plan(jan)
    assert "PartitionFilters" in plan and "p_month" in plan
    assert jan.count() == ev.filter(F.date_format("ts", "yyyy-MM") == "2024-01").count() > 0

    # pruning is physical: the narrow scan reads strictly fewer files
    n_files_full = full.select(F.input_file_name()).distinct().count()
    n_files_jan = jan.select(F.input_file_name()).distinct().count()
    assert 0 < n_files_jan < n_files_full


def test_rollup_expands_one_pass(spark):
    # ROLLUP must compile to an Expand over ONE aggregation pass, not a
    # union of per-level re-aggregations
    plan = _plan(QUERIES["rollup_revenue"].spark_fn(spark, SF_SMOKE))
    assert "Expand" in plan
    assert "Union" not in plan


def test_pivot_two_phase_no_union(spark):
    # Spark pivots as pre-aggregate (user, type) then pivot-aggregate (user):
    # exactly two exchanges, never a per-category union of scans
    plan = _plan(QUERIES["event_type_pivot"].spark_fn(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Union" not in plan


def test_feature_projection_prunes_nested_scan(spark):
    # the P2 defaults projection must read ONLY the touched subfields of the
    # nested document, not the whole struct (nested-schema pruning).  The
    # ReadSchema string truncates at ~100 chars, but the lowlevel struct is
    # the document's FIRST field: unpruned, gfcc/barkbands would appear right
    # after mfcc well inside the truncation window.
    plan = _plan(QUERIES["feature_projection_defaults"].spark_fn(spark, SF_SMOKE))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "lowlevel:struct<mfcc" in read_schema
    assert "gfcc" not in read_schema and "barkbands" not in read_schema
    assert "average_loudness" not in read_schema


def test_highlevel_class_map_broadcasts_model_dim(spark):
    # the 18-row model dimension must broadcast; the only shuffle-worthy
    # relation is the highlevel_model fact side
    plan = _plan(QUERIES["highlevel_class_map"].spark_fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_salted_count_two_phase(spark):
    # two exchanges by design: (key, salt) partial then key final — the
    # template cost of splitting a hot key
    plan = _plan(QUERIES["salted_count_per_key"].spark_fn(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 2


def test_approx_distinct_partial_agg_and_pruned_scan(spark):
    df = QUERIES["approx_distinct_sketch"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    # HLL partials must merge map-side (partial_ before the exchange), and the
    # scan must read only the two involved columns
    assert "merge_approx_count_distinct" in plan or "partial_approx_count_distinct" in plan, plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" in read_schema and "l_returnflag" in read_schema
    assert "l_extendedprice" not in read_schema and "l_quantity" not in read_schema


def test_frequent_items_recount_broadcasts_candidates(spark):
    df = QUERIES["frequent_items_sketch"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    # pass 2 semi-joins the token stream against the SMALL candidate set —
    # broadcast, never a shuffle of the stream on the join key
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_kmeans_assign_is_shuffle_free(spark):
    from pyspark.sql import functions as F

    from acousticbrainz_server_spark.similarity.kmeans import kmeans_assign
    from acousticbrainz_server_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = kmeans_assign(emb, [[0.0] * 64, [1.0] * 64], id_col="vec_id", vec_col="v")
    plan = _plan(assigned)
    # the cell column comes from a mapInPandas over the scan: no Exchange
    assert "Exchange" not in plan, plan


def test_fingerprint_queries_stay_codegen(spark):
    # hot-path shape guards, and no Python UDF may appear in either:
    # - winnow_fingerprint keeps its window-lead shingling (codegen — the
    #   winnow min needs positions, so the window build is the right shape)
    # - benchmark_contamination uses the r6 NARROW shingle build (arrays_zip
    #   + per-row array_distinct): no Window, no distinct Exchange of its
    #   own — a window or an interpreted sequence-transform reappearing here
    #   is the regression this guards against
    plan = _plan(QUERIES["winnow_fingerprint"].spark_fn(spark, SF_SMOKE))
    assert "Window" in plan, f"winnow_fingerprint: expected window-based shingling\n{plan}"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    plan = _plan(QUERIES["benchmark_contamination"].spark_fn(spark, SF_SMOKE))
    assert "Window" not in plan, f"benchmark_contamination: narrow shingle build regressed\n{plan}"
    assert "array_distinct" in plan and "arrays_zip" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pq_assign_is_shuffle_free(spark):
    import os

    from acousticbrainz_server_spark.plans.metric_queries import AB_FIXTURE_DIR
    from acousticbrainz_server_spark.similarity.pq import load_codebooks, pq_assign
    from acousticbrainz_server_spark.sources.tables import load_table

    books = load_codebooks(spark, os.path.join(AB_FIXTURE_DIR, "pq_codebooks.parquet"), 8, 16, 8)
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    plan = _plan(pq_assign(emb, books, id_col="vec_id", vec_col="v"))
    # code assignment is a per-batch table lookup over the scan: no Exchange
    assert "Exchange" not in plan, plan


def test_bm25_postings_zero_token_shuffle(spark):
    # per-term tf is a codegen array expression in the scan projection and
    # per-term df folds into the 1-row stats aggregate, so no token-level
    # row ever reaches an exchange.  Assert the helper's semantics (tf only
    # for matched terms, dl counts ALL tokens, df = docs containing term)
    # and that the postings side of the plan carries no Exchange at all.
    from acousticbrainz_server_spark.plans.retrieval_queries import _postings

    d = spark.createDataFrame(
        [(1, "spark fast spark table"), (2, "slow slow slow")], "doc_id long, text string"
    )
    tf, stats = _postings(d, [(1, "spark"), (2, "table")])
    assert {(r["doc_id"], r["t"]): (r["qid"], r["tf"]) for r in tf.collect()} == {
        (1, "spark"): (1, 2), (1, "table"): (2, 1),
    }
    s = stats.collect()[0]
    assert (s["n_docs"], s["avgdl"], s["df_0"], s["df_1"]) == (2, 3.5, 1, 1)
    # matched postings come straight off the (checkpointed) scan — no shuffle
    assert "Exchange" not in _plan(tf)
    assert "CartesianProduct" not in _plan(QUERIES["bm25_retrieval"].spark_fn(spark, SF_SMOKE))


def test_cross_snapshot_dedup_has_no_cross_product(spark):
    plan = _plan(QUERIES["cross_snapshot_dedup"].spark_fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_bm25_matches_pure_python_reference(spark):
    """BM25 golden: the registered query's scores for a tiny corpus equal a
    direct python implementation of the Lucene-variant formula."""
    import math

    from acousticbrainz_server_spark.plans.retrieval_queries import _B, _K1, _QUERY_TERMS

    docs = [r["text"] for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").orderBy("doc_id").limit(50).collect()]
    ids = list(range(len(docs)))
    toks = [d.split() for d in docs]
    N = len(docs)
    avgdl = sum(len(t) for t in toks) / N
    # python reference for query 1
    q1_terms = [t for q, t in _QUERY_TERMS if q == 1]
    df = {t: sum(1 for tk in toks if t in tk) for t in q1_terms}
    expected = {}
    for i, tk in enumerate(toks):
        s = 0.0
        for t in q1_terms:
            tf = tk.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1 + (N - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (_K1 + 1) / (tf + _K1 * (1 - _B + _B * len(tk) / avgdl))
        if s > 0:
            expected[i] = round(s, 6)

    from pyspark.sql import Window

    from acousticbrainz_server_spark.functions.text import tokens as tok_fn

    d = spark.createDataFrame(list(zip(ids, docs)), "doc_id long, text string")
    tok = d.select("doc_id", F.explode(tok_fn(F.col("text"))).alias("t"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = tok.filter(F.col("t").isin(q1_terms)).groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(N) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * F.col("tf") * (_K1 + 1) / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.lit(avgdl)))
    got = {
        r["doc_id"]: round(r["s"], 6)
        for r in tf.join(F.broadcast(dfc), "t").join(dl, "doc_id").groupBy("doc_id").agg(F.sum(score).alias("s")).collect()
    }
    assert got == expected


def test_semdedup_within_cell_join_no_cross_product(spark):
    df = QUERIES["semdedup_prune"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the pair join is an equi-join on the cell key
    assert "cell" in plan


def test_unigram_logprob_vocab_broadcasts(spark):
    df = QUERIES["unigram_logprob_quality"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    # the Zipf-small vocab table must ride a broadcast back onto the token
    # stream, never shuffle the exploded tokens for a sort-merge join
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_mixture_resample_rates_broadcast_scan_side_decision(spark):
    df = QUERIES["mixture_resample"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bpe_pair_merge_topk_avoids_full_sort(spark):
    df = QUERIES["bpe_pair_merge"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_column_profile_pruned_scan_per_column(spark):
    df = QUERIES["column_profile"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    # one COLUMN-PRUNED scan per profiled column (same total bytes as one
    # full-width scan on a columnar store), hash aggregates per branch — the
    # one-wide-agg alternative degrades to a SortAggregate over a 7-way
    # Expand because min/max over STRING can't hash-aggregate (measured 40x)
    assert plan.count("Scan parquet") == 6
    for c in ("o_custkey", "o_orderdate", "o_orderpriority"):
        assert f"ReadSchema: struct<{c}" in plan  # each branch reads ONLY its column
    # string min/max branches may SortAggregate over their single column,
    # but nothing expands or sorts the full-width rows
    assert "Expand" not in plan


def test_ivf_recall_bounded_and_exact_sides_share_no_cartesian(spark):
    df = QUERIES["ivf_recall_eval"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert abs(r["recall_at_5"] - r["n_hits"] / 5.0) < 1e-9


def test_semdedup_kept_semantics(spark):
    df = QUERIES["semdedup_prune"].spark_fn(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        if r["max_prior_sim"] is None:
            assert r["kept"] is True
        else:
            assert r["kept"] == (r["max_prior_sim"] < 0.4)


def test_cube_expands_one_pass(spark):
    df = QUERIES["cube_revenue"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    # all 4 grouping sets from one Expand over one scan — no self-union
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1
    assert "Union" not in plan


def test_duplicate_span_report_no_doc_pair_join(spark):
    df = QUERIES["duplicate_span_report"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) > 0
    for r in rows.values():
        assert 0 <= r["n_shared"] <= r["n_spans"]


def test_streaming_sliding_counts_matches_batch(spark):
    from acousticbrainz_server_spark.sources.tables import load_table

    df = QUERIES["streaming_sliding_counts"].spark_fn(spark, SF_SMOKE)
    got = {(str(r["window_start"]), r["event_type"]): r["n_events"] for r in df.collect()}
    ev = load_table(spark, SF_SMOKE, "events")
    batch = (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.to_date("w.start").alias("d"), "event_type", "n")
    )
    want = {(str(r["d"]), r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_gap_fill_forward_fills_all_gaps(spark):
    df = QUERIES["gap_fill_forward"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert len(rows) > 0
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        # calendar is dense: consecutive days, no holes
        days = [r["day"] for r in rs]
        assert (days[-1] - days[0]).days + 1 == len(days)
        # first day always has data (bounds come from observed days);
        # afterwards filled_value is never NULL and carries the last value
        assert rs[0]["day_value"] is not None
        last = None
        for r in rs:
            expect = r["day_value"] if r["day_value"] is not None else last
            assert r["filled_value"] == expect
            assert r["is_gap"] == (r["day_value"] is None)
            last = expect


def test_kl_source_drift_nonnegative_single_scan(spark):
    df = QUERIES["kl_source_drift"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    # the (source, token) aggregate is materialized once (localCheckpoint);
    # all four marginal/total branches read the checkpointed table — the
    # final plan contains NO parquet re-scan of the corpus
    assert plan.count("Scan parquet") == 0
    assert "ExistingRDD" in plan
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["kl_divergence"] >= 0.0  # Gibbs' inequality


def test_binary_payload_stats_no_shuffle(spark):
    df = QUERIES["binary_payload_stats"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    # pure scan-side projection: the binary payload never crosses a shuffle
    assert "Exchange" not in plan
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_chunks"] == -(-r["n_bytes"] // 4096)
        assert r["sniffed_mime"] in ("image/png", "audio/wav", "video/mp4")
        assert len(r["payload_md5"]) == 32


def test_rolling_active_users_fanout_and_semantics(spark):
    df = QUERIES["rolling_active_users"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan  # observed-days semi side broadcasts
    got = {str(r["day"]): r["active_users_7d"] for r in df.collect()}
    # recompute directly: distinct users with an event in [d-6, d]
    from acousticbrainz_server_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct().collect()
    days = sorted({r["d"] for r in ev})
    for d in days:
        want = len({r["user_id"] for r in ev if 0 <= (d - r["d"]).days <= 6})
        assert got[str(d)] == want


def test_weighted_sample_topk_window_group_limit(spark):
    df = QUERIES["weighted_sample_topk"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r["sample_rank"])
    for src, ranks in per_source.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


# ---- round-5 continuation batch: graph / layout / sketch-join / melt ----


def test_pagerank_mass_conserved_and_constant_plan(spark):
    # bidirectional graph: no dangling mass, so sum(pr) == |V| exactly (up to
    # fp); ranks positive; the plan depth must NOT grow with iterations
    # (localCheckpoint cuts lineage each round)
    df = QUERIES["pagerank_copurchase"].spark_fn(spark, SF_SMOKE)
    rows = df.collect()
    n = len(rows)
    assert n > 0
    total = sum(r["pr"] for r in rows)
    assert abs(total - n) < 1e-3 * n
    assert all(r["pr"] > 0 for r in rows)
    plan = _plan(df)
    # the checkpoint boundary: the executed plan sees an RDD scan, not a
    # 6-iteration join tree
    assert "Scan ExistingRDD" in plan


def test_pagerank_uniform_on_regular_graph(spark):
    # on a k-regular symmetric graph PageRank's fixpoint is uniform = 1.0
    from acousticbrainz_server_spark.operators.graph import pagerank

    ring = spark.createDataFrame(
        [(i, (i + 1) % 8) for i in range(8)] + [((i + 1) % 8, i) for i in range(8)],
        "src long, dst long",
    )
    got = {r["node"]: r["pr"] for r in pagerank(ring, iterations=5).collect()}
    assert len(got) == 8
    for v in got.values():
        assert abs(v - 1.0) < 1e-9


def test_pagerank_dangling_mass_redistributed(spark):
    # star with edges only INTO the center: leaves + center all dangle except
    # the leaves' out-edges; total mass must still be conserved at |V|
    from acousticbrainz_server_spark.operators.graph import pagerank

    star = spark.createDataFrame([(i, 99) for i in range(1, 6)], "src long, dst long")
    rows = pagerank(star, iterations=4).collect()
    total = sum(r["pr"] for r in rows)
    assert abs(total - len(rows)) < 1e-9
    center = [r["pr"] for r in rows if r["node"] == 99][0]
    assert center > 1.0  # in-flow concentrates on the center


def test_partitioned_write_prunes_partitions(spark):
    df = QUERIES["partitioned_write_prune"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    # the day filter must prune at the DIRECTORY level, not post-scan
    assert "PartitionFilters: [" in plan
    assert "day" in plan.split("PartitionFilters:", 1)[1][:200]
    assert df.count() > 0


def test_bloom_prefilter_superset_and_broadcast(spark):
    from acousticbrainz_server_spark.plans.sketch_queries import bloom_prefilter
    from acousticbrainz_server_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    build = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_nationkey") == 7)
        .select("c_custkey")
    )
    cand = bloom_prefilter(orders, "o_custkey", build)
    true_keys = {r[0] for r in orders.join(
        build.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    ).select("o_custkey").distinct().collect()}
    cand_keys = {r[0] for r in cand.select("o_custkey").distinct().collect()}
    # no false negatives, ever
    assert true_keys <= cand_keys
    # the bit-set side must broadcast (bounded at m rows)
    assert "BroadcastExchange" in _plan(cand)


def test_unpivot_single_scan_no_shuffle(spark):
    df = QUERIES["unpivot_wide_metrics"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan.replace("BroadcastExchange", "")
    assert "Union" not in plan


def test_range_frame_counts_by_value_not_rows(spark):
    # two orders 40 days apart must NOT see each other; same-day peers must
    rows = spark.createDataFrame(
        [(1, 10, "2020-01-01"), (2, 10, "2020-01-01"), (3, 10, "2020-02-15")],
        "o_orderkey long, o_custkey long, d string",
    ).select(
        "o_orderkey", "o_custkey", F.to_timestamp("d").alias("o_orderdate"),
        F.lit(100.0).alias("o_totalprice"),
    )
    import tempfile, os
    out = os.path.join(tempfile.mkdtemp(), "orders.parquet")
    rows.write.parquet(out)
    df = QUERIES["range_frame_revenue"].spark_fn(spark, os.path.dirname(out))
    got = {r["o_orderkey"]: r["n_orders_30d"] for r in df.collect()}
    assert got[1] == 2 and got[2] == 2  # same-day peers included (RANGE)
    assert got[3] == 1  # 45 days later: outside the 30-day frame


def test_event_range_join_no_cartesian_and_keeps_zero_rows(spark):
    df = QUERIES["event_range_join"].spark_fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert len(rows) > 0
    assert any(r["n_clicks_10m"] == 0 for r in rows)  # left-join keeps silent errors


def test_containment_matches_bruteforce(spark):
    # tiny corpus with a verbatim-substring doc: brute-force python containment
    texts = [
        (0, "a b c d e f g h i j"),
        (1, "x x a b c d e f g h i j y y z z q r s t"),  # contains doc 0's grams
        (2, "p q r s t u v w x y"),
    ]
    import tempfile, os
    d = spark.createDataFrame(texts, "doc_id long, text string")
    out = os.path.join(tempfile.mkdtemp(), "documents.parquet")
    d.write.parquet(out)
    df = QUERIES["containment_neardup"].spark_fn(spark, os.path.dirname(out))
    got = {(r["doc_sub"], r["doc_sup"]): r["containment"] for r in df.collect()}

    def grams(t):
        w = t.split()
        return {" ".join(w[i:i + 5]) for i in range(len(w) - 4)}

    g = {i: grams(t) for i, t in texts}
    for a in g:
        for b in g:
            if a == b or not g[a]:
                continue
            c = len(g[a] & g[b]) / len(g[a])
            if c >= 0.8:
                assert (a, b) in got and abs(got[(a, b)] - c) < 1e-3
            else:
                assert (a, b) not in got
    assert (0, 1) in got  # the substring pair is directed: 0 inside 1, not 1 inside 0
    assert (1, 0) not in got


def test_q19_part_envelope_prunes_broadcast_dim(spark):
    """brand_quantity_revenue: the (brand, size) half of the disjunction
    must reach the part scan as PushedFilters (Or(...)) so the broadcast
    dim ships only candidate parts, and the join side stays broadcast."""
    plan = _plan(QUERIES["brand_quantity_revenue"].spark_fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    part_scan_lines = [
        l for l in plan.splitlines() if "PushedFilters" in l and "p_brand" in l
    ]
    assert part_scan_lines and "Or(" in part_scan_lines[0]


def test_skew_split_hot_path_has_no_shuffle_join(spark):
    """skew_isolated_join: the hot branch must be broadcast joins only —
    build the hot sub-plan separately via the shared planner and assert it
    contains NO sort-merge join at all (the cold tail may plan either way
    under AQE)."""
    from acousticbrainz_server_spark.functions.skew import hot_cold_split_join
    from acousticbrainz_server_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value")
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    hot = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(5)
        .select("user_id")
    )
    hot_j, cold_j = hot_cold_split_join(
        ev, cust, fact_key="user_id", dim_key="c_custkey", hot_keys=hot
    )
    hot_plan = _plan(hot_j)
    assert "SortMergeJoin" not in hot_plan  # the docstring's actual invariant
    assert "BroadcastHashJoin" in hot_plan
    # whole-query sanity: the registered plan keeps the broadcast pair
    plan = _plan(QUERIES["skew_isolated_join"].spark_fn(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2  # hot facts x hot dim + semis


def test_skew_join_planned_hot_mass_never_shuffles(spark):
    """skew_join_planned (the planner's second consumer, the genuinely-hot
    shape): the whole plan must carry the hot branch as broadcast joins —
    with ~75% of fact rows on the hot key, a single SortMergeJoin touching
    the hot facts would defeat the planner.  The fact side may shuffle at
    most for the final priority rollup (an aggregate exchange, not a join
    exchange of the hot mass)."""
    plan = _plan(QUERIES["skew_join_planned"].spark_fn(spark, SF_SMOKE))
    # hot facts x hot dim + the two semi/anti probes are all broadcast
    assert plan.count("BroadcastHashJoin") >= 3
    # the hot branch never sort-merges; the cold tail may (AQE decides) —
    # at SF_SMOKE AQE broadcasts it too, so the whole plan is SMJ-free
    assert "SortMergeJoin" not in plan


def test_cdc_single_scan_position_explode(spark):
    """cdc_chunk_dedup: the boundary scan is ONE Generate (explode) off the
    documents scan — no join in the position/hash stage; the chunk-hash
    rollup aggregates with map-side combine."""
    plan = _plan(QUERIES["cdc_chunk_dedup"].spark_fn(spark, SF_SMOKE))
    assert "Generate explode" in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_kmv_union_uses_take_ordered_not_global_window(spark):
    """kmv_distinct_union: the union sketch's k global minima must come
    from TakeOrderedAndProject (distributed top-k), never a
    single-partition Window sort."""
    plan = _plan(QUERIES["kmv_distinct_union"].spark_fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_bitmap_rollup_merges_without_rescan(spark):
    """bitmap_distinct_rollup: the union row must reuse the per-(type,
    bucket) bitmap exchange, not rescan events.  AQE stitches ReusedExchange
    at runtime, so execute first and inspect the final adaptive plan."""
    df = QUERIES["bitmap_distinct_rollup"].spark_fn(spark, SF_SMOKE)
    df.collect()
    plan = _plan(df)
    assert "ReusedExchange" in plan or plan.count("FileScan parquet") == 1
