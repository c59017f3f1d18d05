"""Unit tests for the round-6 session-3 queries: property checks that the
DuckDB oracle gate cannot express (definition-level recomputes, lossless-
filter claims, API-surface invariants)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from acousticbrainz_server_spark.plans.registry import QUERIES, _load_all
from tests.conftest import SF_SMOKE

_load_all()


def _run(name, spark, sf=SF_SMOKE):
    return QUERIES[name].spark_fn(spark, sf).toPandas()


def test_welch_matches_direct_recompute(spark):
    """t and df recompute from first principles on the per-user cents."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    pu = (
        ev.groupBy("user_id")
        .agg(F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("c"))
        .withColumn(
            "arm",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
                "long"
            )
            % 2,
        )
        .toPandas()
    )
    a = pu[pu.arm == 0].c.to_numpy()
    b = pu[pu.arm == 1].c.to_numpy()

    def var(x):
        m = x.sum() / len(x)
        return float(((x - m) ** 2).sum()) / (len(x) - 1)

    ma, mb, va, vb = a.mean(), b.mean(), var(a), var(b)
    se2 = va / len(a) + vb / len(b)
    t = (mb - ma) / math.sqrt(se2)
    df = se2**2 / ((va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1))
    row = _run("ab_welch_ttest", spark).iloc[0]
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.t_welch - t) < 5e-4
    assert abs(row.df_welch - df) < 5e-2
    assert abs(row.mean_a - ma / 100) < 5e-4 and abs(row.mean_b - mb / 100) < 5e-4


def test_paragraph_dedup_self_concat_halves_retention(spark, tmp_path):
    """A corpus where every doc appears twice keeps exactly the first copy's
    paragraphs: dup docs retain 0, originals retain 1."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    dup = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang", "source", "n_chars")
    both = docs.unionByName(dup)
    out_dir = str(tmp_path / "docs_dup")
    both.write.parquet(out_dir + "/documents.parquet")
    res = _run("paragraph_dedup", spark, out_dir)
    orig = res[res.doc_id < 1000000]
    copies = res[res.doc_id >= 1000000]
    assert (copies.n_kept == 0).all(), "verbatim duplicates must keep nothing"
    assert (copies.kept_frac == 0.0).all()
    # duplication adds zero NEW kept paragraphs: the originals' kept set is
    # exactly what the original-only corpus keeps (the corpus itself holds
    # cross-doc duplicate paragraphs, so kept_frac < 1 for some originals)
    base_dir = str(tmp_path / "docs_base")
    docs.write.parquet(base_dir + "/documents.parquet")
    base = _run("paragraph_dedup", spark, base_dir)
    assert int(orig.n_kept.sum()) == int(base.n_kept.sum())
    assert int(orig.n_paras.sum()) == int(base.n_paras.sum())


def test_adamic_adar_bruteforce_small_graph(spark):
    """AA scores recompute by brute force over the pruned graph at sf0.001."""
    res = _run("link_prediction_adamic_adar", spark)
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select("l_orderkey", "l_partkey")
    op = li.distinct().toPandas()
    from collections import defaultdict

    baskets = defaultdict(set)
    for ok, pk in op.itertuples(index=False):
        baskets[ok].add(pk)
    cnt = defaultdict(int)
    for items in baskets.values():
        s = sorted(items)
        for i, x in enumerate(s):
            for y in s[i + 1 :]:
                cnt[(x, y)] += 1
    edges = {e for e, c in cnt.items() if c >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    scores = {}
    for z, nbs in adj.items():
        if len(nbs) < 2:
            continue
        s = sorted(nbs)
        for i, x in enumerate(s):
            for y in s[i + 1 :]:
                if (x, y) in edges:
                    continue
                a, n = scores.get((x, y), (0.0, 0))
                scores[(x, y)] = (a + 1.0 / math.log(len(adj[z])), n + 1)
    for r in res.itertuples(index=False):
        aa, n = scores[(r.part_u, r.part_v)]
        assert n == r.n_common
        assert abs(aa - r.aa_score) < 5e-4


def test_kcore_monotone_and_matches_bruteforce(spark):
    """Survivor counts never grow, and every round's (n_nodes, n_edges)
    equals a brute-force python peel of the same pruned graph."""
    res = _run("kcore_peeling", spark).sort_values("round")
    nodes = res.n_nodes.tolist()
    edges_counts = res.n_edges.tolist()
    assert nodes == sorted(nodes, reverse=True)
    assert edges_counts == sorted(edges_counts, reverse=True)

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select("l_orderkey", "l_partkey")
    op = li.distinct().toPandas()
    from collections import defaultdict

    baskets = defaultdict(set)
    for ok, pk in op.itertuples(index=False):
        baskets[ok].add(pk)
    cnt = defaultdict(int)
    for items in baskets.values():
        s = sorted(items)
        for i, x in enumerate(s):
            for y in s[i + 1 :]:
                cnt[(x, y)] += 1
    e = {pair for pair, c in cnt.items() if c >= 2}
    for rnd in range(3):
        deg = defaultdict(int)
        for u, v in e:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= 3}
        e = {(u, v) for u, v in e if u in keep and v in keep}
        assert (nodes[rnd], edges_counts[rnd]) == (len(keep), len(e)), f"round {rnd + 1}"


def test_recursive_cte_min_hops_match_bfs(spark):
    """min_hops from the recursive CTE equals textbook BFS distance for every
    reported (seed, node) within the hop bound."""
    res = _run("recursive_cte_reachability", spark)
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select("l_orderkey", "l_partkey")
    op = li.distinct().toPandas()
    from collections import defaultdict, deque

    baskets = defaultdict(set)
    for ok, pk in op.itertuples(index=False):
        baskets[ok].add(pk)
    cnt = defaultdict(int)
    for items in baskets.values():
        s = sorted(items)
        for i, x in enumerate(s):
            for y in s[i + 1 :]:
                cnt[(x, y)] += 1
    adj = defaultdict(set)
    for (u, v), c in cnt.items():
        if c >= 2:
            adj[u].add(v)
            adj[v].add(u)
    seeds = sorted(adj)[:5]
    for seed in seeds:
        dist = {seed: 0}
        q = deque([seed])
        while q:
            n = q.popleft()
            if dist[n] >= 3:
                continue
            for nb in adj[n]:
                if nb not in dist:
                    dist[nb] = dist[n] + 1
                    q.append(nb)
        sub = res[res.seed == seed]
        got = dict(zip(sub.node, sub.min_hops))
        want = {n: d for n, d in dist.items() if 0 < d <= 3}
        assert got == want, f"seed {seed}"


def test_fuzzy_length_band_is_lossless(spark):
    """No pair outside the length band can match: levenshtein >= |len diff|,
    so n_matched computed WITHOUT the band filter is identical."""
    p = spark.read.parquet(f"{SF_SMOKE}/part.parquet")
    a = p.select(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"),
                 F.col("p_partkey").alias("ia"), F.col("p_name").alias("na"))
    b = p.select(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"),
                 F.col("p_partkey").alias("ib"), F.col("p_name").alias("nb"))
    full = (
        a.join(b, ["brand", "size"]).filter(F.col("ia") < F.col("ib"))
        .filter(F.levenshtein("na", "nb") <= 2)
        .count()
    )
    rep = _run("fuzzy_name_match_report", spark)
    assert int(rep.n_matched.sum()) == full


def test_benford_distribution_sums_to_one(spark):
    res = _run("benford_digit_profile", spark)
    assert abs(res.obs_freq.sum() - 1.0) < 1e-3
    assert abs(res.benford_freq.sum() - 1.0) < 1e-3
    assert set(res.digit) <= set(range(1, 10))


def test_transpose_matrix_shape_and_values(spark):
    res = _run("transpose_metrics_matrix", spark)
    assert list(res.columns)[0] == "key"
    assert set(res.key) == {"n_events", "avg_value", "n_users"}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_click = ev.filter(F.col("event_type") == "click").count()
    got = float(res[res.key == "n_events"].click.iloc[0])
    assert got == float(n_click)


def test_xml_roundtrip_row_identity(spark):
    """Row-level identity, not just the aggregate: roundtripped rows equal
    the source rows exactly."""
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").limit(200).select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    xml = o.select(F.to_xml(F.struct("o_orderkey", "o_orderpriority", "cents")).alias("x"))
    back = xml.select(
        F.from_xml("x", "o_orderkey BIGINT, o_orderpriority STRING, cents BIGINT").alias("r")
    ).select("r.*")
    assert back.exceptAll(o).count() == 0 and o.exceptAll(back).count() == 0


def test_variant_get_null_safe(spark):
    """try_variant_get degrades missing and mistyped paths to NULL."""
    df = spark.createDataFrame([('{"k": 5}',), ('{"k": "not-an-int-at-all"}',), ("{}",)], "props STRING")
    out = df.select(
        F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
        F.try_variant_get(F.parse_json("props"), "$.absent", "int").alias("a"),
    ).toPandas()
    assert out.k.tolist()[0] == 5
    assert out.a.isna().all()


def test_udtf_chunk_profile_matches_native_chunker(spark):
    """The UDTF route agrees with a pure-python recompute on raw text."""
    res = _run("python_udtf_chunk_profile", spark).set_index("doc_id")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(30).toPandas()
    for r in docs.itertuples(index=False):
        toks = r.text.strip().split()
        chunks = [toks[i : i + 20] for i in range(0, len(toks), 20)]
        row = res.loc[r.doc_id]
        assert row.n_chunks == len(chunks)
        assert row.n_tokens == sum(len(c) for c in chunks)
        assert row.n_distinct_sum == sum(len(set(c)) for c in chunks)


def _run_stream_until(spark, n_cap, batch, out, ckpt, n_expected, timeout=90):
    """Run the synth stream with rapid micro-batches until the parquet sink
    holds n_expected rows, then stop.  (availableNow snapshots only the
    FIRST prefetched batch for SimpleDataSourceStreamReader, so bounded
    tests drive the micro-batch loop explicitly.)"""
    import time as _time

    q = (
        spark.readStream.format("synthevents")
        .option("n", n_cap)
        .option("batch", batch)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _time.time() + timeout
        while _time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= n_expected:
                    break
            except Exception:
                pass
            _time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)


def test_python_datasource_stream_reader_micro_batches(spark, tmp_path):
    """The streaming twin of the synth source feeds offset-tracked
    micro-batches and lands EXACTLY the batch reader's rows."""
    from acousticbrainz_server_spark.sources.pydatasource import register_synth_source

    register_synth_source(spark)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    _run_stream_until(spark, 2500, 400, out, ckpt, 2500)
    got = spark.read.parquet(out)
    want = spark.read.format("synthevents").option("n", 2500).load()
    assert got.count() == 2500
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_python_datasource_stream_resume_no_duplicates(spark, tmp_path):
    """Restarting from the checkpoint continues at the committed offset:
    two runs against a GROWING cap produce each row exactly once."""
    from acousticbrainz_server_spark.sources.pydatasource import register_synth_source

    register_synth_source(spark)
    out = str(tmp_path / "stream_out2")
    ckpt = str(tmp_path / "ckpt2")
    _run_stream_until(spark, 1000, 300, out, ckpt, 1000)
    # the feed grew; the resumed query must emit ONLY rows 1000..1799
    _run_stream_until(spark, 1800, 300, out, ckpt, 1800)
    got = spark.read.parquet(out)
    assert got.count() == 1800
    assert got.select("event_id").distinct().count() == 1800


def test_wav_codec_roundtrip_and_validation():
    """The real stdlib WAV codec: exact sample fidelity both directions,
    and malformed payloads are rejected, not misparsed."""
    import pytest as _pytest

    from acousticbrainz_server_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    payload = encode_wav_pcm16(samples, 44100)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    rate, back = decode_wav_pcm16(payload)
    assert rate == 44100 and back == samples
    with _pytest.raises(ValueError):
        decode_wav_pcm16(b"JUNK" + payload[4:])
    with _pytest.raises(ValueError):
        # stereo header must be rejected, not silently mono-parsed
        import struct
        bad = bytearray(payload)
        bad[22:24] = struct.pack("<H", 2)
        decode_wav_pcm16(bytes(bad))


def test_pgm_codec_roundtrip_and_validation():
    import pytest as _pytest

    from acousticbrainz_server_spark.operators.multimodal import decode_pgm, encode_pgm

    pixels = list(range(256)) * 1
    payload = encode_pgm(pixels, 16, 16)
    w, h, raster = decode_pgm(payload)
    assert (w, h) == (16, 16) and list(raster) == pixels
    with _pytest.raises(ValueError):
        decode_pgm(b"P6\n" + payload[3:])
    with _pytest.raises(ValueError):
        decode_pgm(payload[:-1])  # truncated raster
    with _pytest.raises(ValueError):
        encode_pgm(pixels, 16, 15)
