"""Streaming suite: QueryMode FUTURE / CURRENT_AND_FUTURE (ST1-ST3)."""

import os

import pytest
from pyspark.sql import functions as F

from yaii_spark.queries import ast as A
from yaii_spark.streaming import QueryMode, compile_predicate, continuous_query, windowed_ingest_stats
from yaii_spark.synth import PAGES_SCHEMA, gen_boolean_pages, gen_pages


@pytest.fixture()
def stream_dir(spark, tmp_path):
    d = str(tmp_path / "incoming")
    os.makedirs(d, exist_ok=True)
    return d


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_future_mode_filters_new_batches(spark, stream_dir):
    sdf, cur = continuous_query(
        spark, A.and_(A.token("abc"), A.not_(A.token("efg"))),
        QueryMode.FUTURE, stream_dir, PAGES_SCHEMA,
    )
    assert cur is None
    # "added" batch arrives
    gen_boolean_pages(spark).write.mode("append").parquet(stream_dir)
    out = _run_stream(spark, sdf, "fut1")
    assert {r.doc_id for r in out.collect()} == {12, 14}


def test_current_and_future_union(spark, stream_dir):
    current = gen_boolean_pages(spark)
    sdf, cur = continuous_query(
        spark, A.token("abc"), QueryMode.CURRENT_AND_FUTURE,
        stream_dir, PAGES_SCHEMA, current_df=current,
    )
    assert {r.doc_id for r in cur.collect()} == {12, 14}
    gen_pages(spark, 30, include_fixtures=True).write.mode("append").parquet(stream_dir)
    out = _run_stream(spark, sdf, "fut2")
    # none of the 30 synthetic pages contain 'abc'
    assert out.count() == 0
    gen_boolean_pages(spark).write.mode("append").parquet(stream_dir)
    out2 = _run_stream(spark, sdf, "fut3")
    assert {r.doc_id for r in out2.collect()} == {12, 14}


def test_current_via_index_catalog(spark, stream_dir, bool_index):
    """CURRENT_AND_FUTURE with the snapshot served by the committed
    INDEX (posting-list engine) instead of a re-tokenizing scan — the
    reference's committed + mutable split. Doc-for-doc identical to the
    scan form, and the FUTURE side still sees fresh batches."""
    q = A.and_(A.token("abc"), A.not_(A.token("efg")))
    sdf, cur = continuous_query(
        spark, q, QueryMode.CURRENT_AND_FUTURE, stream_dir, PAGES_SCHEMA,
        current_catalog=bool_index,
    )
    assert {r.doc_id for r in cur.collect()} == {12, 14}
    _, cur_scan = continuous_query(
        spark, q, QueryMode.CURRENT, stream_dir, PAGES_SCHEMA,
        current_df=gen_boolean_pages(spark),
    )
    assert {r.doc_id for r in cur.collect()} == {
        r.doc_id for r in cur_scan.collect()
    }
    gen_boolean_pages(spark).write.mode("append").parquet(stream_dir)
    out = _run_stream(spark, sdf, "fut_cat")
    assert {r.doc_id for r in out.collect()} == {12, 14}
    # sorted CURRENT through the index path (TakeOrderedAndProject)
    _, cur_sorted = continuous_query(
        spark, A.token("abc"), QueryMode.CURRENT, stream_dir, PAGES_SCHEMA,
        current_catalog=bool_index, sort=[("num_attr", "desc")],
    )
    assert [r.doc_id for r in cur_sorted.collect()] == [14, 12]


def test_sorted_future_raises(spark, stream_dir):
    # exact reference restriction (base-inverted-index.ts:431)
    with pytest.raises(ValueError, match="future queries cannot have sort"):
        continuous_query(
            spark, A.token("abc"), QueryMode.FUTURE, stream_dir, PAGES_SCHEMA,
            sort=[("doc_id", "asc")],
        )


def test_watermark_drops_late_events(spark, stream_dir, tmp_path):
    """Late-data handling: once the watermark passes a window's end,
    an event falling in that window is DROPPED — the closed window's
    append-mode emission does not include it. Watermark state survives
    across restarts via the checkpoint."""
    import datetime as dt

    from yaii_spark.synth import PAGES_SCHEMA, render_html

    mk = lambda i, ts: (i, f"https://x/{i}", ts, render_html("x"), "x", "en", i)
    t = lambda m, s: dt.datetime(2024, 1, 1, 10, m, s)

    agg = windowed_ingest_stats(
        spark, stream_dir, PAGES_SCHEMA, window="1 minute",
        watermark="0 seconds",
    )
    # ONE long-lived query (watermark state lives in the running query;
    # the memory sink cannot recover a checkpoint across restarts) —
    # files appended between processAllAvailable calls are the "added"
    # batches, and no-data micro-batches emit watermark-finalized
    # windows
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName("wm_out").trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        def feed(rows):
            spark.createDataFrame(rows, PAGES_SCHEMA).write.mode(
                "append"
            ).parquet(stream_dir)
            q.processAllAvailable()

        # batch A: two on-time events; watermark advances to 10:01:10,
        # closing window [10:00, 10:01)
        feed([mk(0, t(0, 10)), mk(1, t(1, 10))])
        # batch B: one LATE event into the closed 10:00 window (must be
        # dropped) + one fresh event advancing the watermark past 10:02
        feed([mk(2, t(0, 30)), mk(3, t(2, 30))])
        # batch C: push the watermark far ahead so every earlier window
        # finalizes and emits
        feed([mk(4, t(9, 0))])
        import time as _time

        for _ in range(50):  # wait for the finalizing no-data batches
            rows = spark.sql("SELECT * FROM wm_out").collect()
            if len({r.start.minute for r in rows}) >= 3:
                break
            _time.sleep(0.2)
            q.processAllAvailable()
    finally:
        q.stop()
    counts = {r.start.minute: r.n_docs for r in rows}
    assert counts[0] == 1, counts  # the late 10:00:30 event was dropped
    assert counts[1] == 1 and counts[2] == 1, counts


def test_windowed_ingest_stats(spark, stream_dir):
    gen_pages(spark, 100, include_fixtures=False).write.mode("append").parquet(stream_dir)
    agg = windowed_ingest_stats(spark, stream_dir, PAGES_SCHEMA, window="1 minute")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("ingest_stats")
        .trigger(availableNow=True).start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM ingest_stats").collect()
    assert sum(r.n_docs for r in rows) == 100
    assert all(r.text_bytes > 0 for r in rows)


ALL_NODE_QUERIES = [
    ("token", lambda: A.token("abc")),
    ("token_all", lambda: A.token("abc", "_all")),
    ("and", lambda: A.and_(A.token("abc"), A.token("bcd"))),
    ("or", lambda: A.or_(A.token("abc"), A.token("efg"))),
    ("not", lambda: A.not_(A.token("abc"))),
    ("and_not", lambda: A.and_(A.or_(A.token("abc"), A.token("efg")), A.not_(A.token("bcd")))),
    ("all", lambda: A.all_docs()),
    ("phrase", lambda: A.phrase(["abc", "bcd"])),
    ("phrase3", lambda: A.phrase(["lorem", "ipsum", "abc"])),
    ("phrase_slop", lambda: A.phrase(["abc", "test"], slop=2)),
    ("phrase_slop_miss", lambda: A.phrase(["abc", "test"], slop=1)),
    ("phrase_all_field", lambda: A.phrase(["lorem", "ipsum"], "_all")),
    ("token_range", lambda: A.token_range("text", "a", "c")),
    ("token_range_open", lambda: A.token_range("text", "t", None)),
    ("text_contains", lambda: A.text_contains("or")),
    ("number_eq", lambda: A.number("num_attr", 25)),
    ("number_range", lambda: A.number_range("num_attr", 15, 40)),
    ("has_field", lambda: A.has_field("lang")),
    ("mixed", lambda: A.and_(A.token("abc"), A.number_range("num_attr", None, 22))),
]


@pytest.fixture(scope="module")
def bool_index(spark, work_dir):
    from yaii_spark.indexer import build_index
    from yaii_spark.storage import IndexCatalog

    idx = f"{work_dir}/stream_parity_idx"
    build_index(
        spark, gen_boolean_pages(spark), idx, seg_size=2,
        stored_cols=["text", "lang", "num_attr"],
    )
    return IndexCatalog(spark, idx)


@pytest.mark.parametrize("name,qf", ALL_NODE_QUERIES, ids=[n for n, _ in ALL_NODE_QUERIES])
def test_compile_predicate_matches_engine(spark, bool_index, name, qf):
    """The streaming per-batch predicate covers the FULL batch AST
    (Phrase incl. slop, TokenRange, TextContains, attributes, boolean
    composition) and agrees with the posting-based engine doc-for-doc —
    a FUTURE continuous query accepts exactly the queries batch does."""
    from yaii_spark.analyzer import tokenize_all_udf, tokenize_udf
    from yaii_spark.queries.executor import execute_boolean

    q = A.rewrite(qf())
    engine = {r.doc_id for r in execute_boolean(bool_index, q).collect()}
    tok = (
        gen_boolean_pages(spark)
        .withColumn("_tokens", tokenize_udf(F.col("text")))
        .withColumn("_all_tokens", tokenize_all_udf(F.col("text")))
    )
    stream_form = {r.doc_id for r in tok.filter(compile_predicate(q)).collect()}
    assert stream_form == engine, (name, stream_form, engine)


def test_index_append_sink_commits_segments(spark, stream_dir, tmp_path):
    """Two micro-batches land as DISJOINT durable segments; queries
    over the union match a one-shot batch build doc-for-doc (url-keyed
    — the sink assigns its own dense ids), corpus stats are recomputed
    across batches, and checkpoints/term_stats stay consistent
    (VERDICT r3 #4)."""
    from yaii_spark.indexer import build_index
    from yaii_spark.queries.bm25 import bm25_topk
    from yaii_spark.queries.executor import execute_boolean, search
    from yaii_spark.storage import IndexCatalog
    from yaii_spark.streaming import index_append_sink

    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "sink_ckpt")
    b1 = gen_pages(spark, 30, include_fixtures=True)
    b2 = gen_pages(spark, 90, include_fixtures=False).filter(F.col("doc_id") >= 30)

    def run_batch(df):
        df.write.mode("append").parquet(stream_dir)
        q = index_append_sink(
            spark, stream_dir, PAGES_SCHEMA, idx, seg_size=16,
            checkpoint_dir=ckpt, trigger_available_now=True,
            stored_cols=["url", "text", "lang", "num_attr"],
        )
        q.awaitTermination(120)
        q.stop()

    run_batch(b1)
    cat = IndexCatalog(spark, idx)
    segs1 = {r.seg_id for r in cat.seg_meta().collect()}
    assert cat.corpus_stats().n_docs == 30
    run_batch(b2)
    cat = IndexCatalog(spark, idx)  # fresh caches (stats changed)
    segs2 = {r.seg_id for r in cat.seg_meta().collect()}
    assert segs1 < segs2 and len(segs2) > len(segs1)  # batch 2 = new segs only
    stats = cat.corpus_stats()
    assert stats.n_docs == 90
    # checkpoints cover every segment exactly once
    ck = cat.checkpoints().collect()
    assert {r.seg_id for r in ck} == segs2 and len(ck) == len(segs2)

    # one-shot reference build over the same pages (its own dense ids)
    ref_dir = str(tmp_path / "oneshot_idx")
    build_index(
        spark, b1.unionByName(b2), ref_dir, seg_size=16,
        stored_cols=["url", "text", "lang", "num_attr"],
    )
    ref = IndexCatalog(spark, ref_dir)
    assert abs(ref.corpus_stats().avgdl - stats.avgdl) < 1e-9

    def urls(cat_, q):
        got = search(cat_, q, projection=["url"]).collect()
        return {r.url for r in got}

    for q in [A.token("lorem"), A.token("url"), A.not_(A.token("url")),
              A.phrase(["lorem", "ipsum"])]:
        assert urls(cat, q) == urls(ref, q), q
    # BM25 scores identical per url (stats are corpus-wide on both
    # sides); pruned path falls back to exact under drifted avgdl_built
    # but must return the same rows
    def scored(cat_, prune):
        # k covers every match: the two indexes assign different doc
        # ids, so a k that cuts inside a score tie would select
        # different (url-wise) docs on each side
        top = bm25_topk(cat_, ["url", "wcsfc"], k=200, prune=prune)
        docs = cat_.docs().select("doc_id", "url")
        return {
            (r.url, round(r.score, 9))
            for r in top.join(docs, "doc_id").collect()
        }

    assert scored(cat, False) == scored(ref, False)
    assert scored(cat, True) == scored(ref, True)


def test_refresh_block_bounds_after_append(spark, tmp_path):
    """Appended segments carry bounds built under their batch-local
    avgdl (bm25 auto-falls back to exact for them — rank-safe).
    refresh_block_bounds recomputes the bounds in place under the
    corpus avgdl: every avgdl_built flips to the corpus value, scores
    stay byte-identical on both scorer paths, and posting bytes other
    than the bounds are untouched."""
    from yaii_spark.indexer import refresh_block_bounds
    from yaii_spark.queries.bm25 import bm25_topk
    from yaii_spark.storage import IndexCatalog
    from yaii_spark.streaming import make_append_committer

    idx = str(tmp_path / "refresh_idx")
    commit = make_append_committer(
        idx, seg_size=16, stored_cols=["url", "text", "lang", "num_attr"]
    )
    # batches with different token-length mixes → avgdl drifts
    commit(gen_pages(spark, 40, include_fixtures=False, tokens_range=(8, 24)), 0)
    commit(
        gen_pages(spark, 80, include_fixtures=False, tokens_range=(40, 64))
        .filter(F.col("doc_id") >= 40),
        1,
    )
    cat = IndexCatalog(spark, idx)
    stats = cat.corpus_stats()
    built = {r.seg_id: r.avgdl_built for r in cat.seg_meta().collect()}
    assert any(v != stats.avgdl for v in built.values())  # drift exists
    pre = {}
    for prune in (False, True):
        pre[prune] = [
            (r.doc_id, round(r.score, 9))
            for r in bm25_topk(cat, ["url", "wcsfc"], k=20, prune=prune).collect()
        ]
    ids_bytes_before = {
        (r.seg_id, r.field, r.term): bytes(r.doc_ids_bin)
        for r in cat.postings([("text", "url")]).collect()
    }
    m = refresh_block_bounds(spark, idx)
    assert m["segments_refreshed"] >= 1
    cat2 = IndexCatalog(spark, idx)
    assert all(
        r.avgdl_built == stats.avgdl for r in cat2.seg_meta().collect()
    )
    for prune in (False, True):
        post = [
            (r.doc_id, round(r.score, 9))
            for r in bm25_topk(cat2, ["url", "wcsfc"], k=20, prune=prune).collect()
        ]
        assert post == pre[prune], prune
    # id/tf bytes untouched — only bounds changed
    ids_bytes_after = {
        (r.seg_id, r.field, r.term): bytes(r.doc_ids_bin)
        for r in cat2.postings([("text", "url")]).collect()
    }
    assert ids_bytes_after == ids_bytes_before
    # second refresh is a no-op
    assert refresh_block_bounds(spark, idx)["segments_refreshed"] == 0


def test_append_committer_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch_id — Spark re-runs a batch
    whose foreachBatch died before the stream checkpoint advanced)
    must re-land on its ORIGINAL segment range via the durable sink
    ledger, not derive a new one and index the docs twice."""
    from yaii_spark.ops.aggregations import index_size
    from yaii_spark.queries import ast as A
    from yaii_spark.queries.executor import execute_boolean
    from yaii_spark.storage import IndexCatalog
    from yaii_spark.streaming import make_append_committer

    idx = str(tmp_path / "replay_idx")
    commit = make_append_committer(
        idx, seg_size=16, stored_cols=["url", "text", "lang", "num_attr"]
    )
    b1 = gen_pages(spark, 30, include_fixtures=True)
    b2 = gen_pages(spark, 50, include_fixtures=False).filter(F.col("doc_id") >= 30)
    commit(b1, 0)
    n1 = index_size(IndexCatalog(spark, idx))
    commit(b1, 0)  # replay of batch 0 — must not duplicate
    cat = IndexCatalog(spark, idx)
    assert index_size(cat) == n1 == 30
    commit(b2, 1)
    cat = IndexCatalog(spark, idx)
    assert index_size(cat) == 50
    # ledger has exactly one range per batch, ranges disjoint
    from yaii_spark.storage import read_table

    led = {r.batch_id: r.start_id for r in read_table(spark, f"{idx}/sink_ledger").collect()}
    assert len(led) == 2 and led[0] == 0 and led[1] >= 32
    # content still correct after the replay
    got = execute_boolean(cat, A.token("lorem"))
    assert got.count() == 1
    # replay of an already-complete batch AFTER later batches landed is
    # also safe (resume skips its completed segments)
    commit(b1, 0)
    cat = IndexCatalog(spark, idx)
    assert index_size(cat) == 50


def test_sink_ledger_pre_r5_backfill(spark, tmp_path):
    """A pre-r5 sink ledger (no end_id spans) must be backfilled ONCE —
    the next commit derives its start from the seg_meta scan, rewrites
    the ledger with contiguous spans, and every later commit takes the
    1-row-aggregate fast path (no full ledger collect, no seg_meta
    scan). Also covers the mixed case: rows whose end_id reads back
    NULL (old parquet file sampled under the new schema) trigger the
    same one-time rewrite."""
    from yaii_spark.ops.aggregations import index_size
    from yaii_spark.storage import IndexCatalog, read_table, write_table
    from yaii_spark.streaming import make_append_committer

    idx = str(tmp_path / "backfill_idx")
    commit = make_append_committer(
        idx, seg_size=16, stored_cols=["url", "text", "lang", "num_attr"]
    )
    b1 = gen_pages(spark, 30, include_fixtures=True)
    b2 = gen_pages(spark, 50, include_fixtures=False).filter(F.col("doc_id") >= 30)
    commit(b1, 0)
    commit(b2, 1)
    # simulate a pre-r5 ledger: drop the spans entirely
    ledger = f"{idx}/sink_ledger"
    old = read_table(spark, ledger).select("batch_id", "start_id")
    rows = [(int(r.batch_id), int(r.start_id)) for r in old.collect()]
    write_table(
        spark.createDataFrame(rows, "batch_id long, start_id long"), ledger
    )
    b3 = (
        gen_pages(spark, 70, include_fixtures=False)
        .filter(F.col("doc_id") >= 50)
        .withColumn("doc_id", F.col("doc_id") - 50)  # committer re-bases
    )
    commit(b3, 2)
    led = sorted(
        (int(r.batch_id), int(r.start_id), int(r.end_id))
        for r in read_table(spark, ledger).collect()
    )
    # every row (old AND new) now carries a span; spans are contiguous
    assert [b for b, _, _ in led] == [0, 1, 2]
    for (_, s0, e0), (_, s1, _) in zip(led, led[1:]):
        assert e0 == s1 > s0
    assert index_size(IndexCatalog(spark, idx)) == 70
    # a fourth commit under the healed ledger extends it by exactly one
    # spanned row (append fast path, no rewrite of the old rows)
    b4 = (
        gen_pages(spark, 90, include_fixtures=False)
        .filter(F.col("doc_id") >= 70)
        .withColumn("doc_id", F.col("doc_id") - 70)
    )
    commit(b4, 3)
    led2 = read_table(spark, ledger)
    assert led2.count() == 4
    assert led2.filter(F.col("end_id").isNull()).count() == 0
    assert index_size(IndexCatalog(spark, idx)) == 90


def _ts_rows(spark, idx):
    from yaii_spark.storage import read_table

    return sorted(
        (int(r.bucket), r.field, r.term, int(r.df), int(r.cf))
        for r in read_table(spark, f"{idx}/term_stats").collect()
    )


_FOLD_STORED = ["url", "text", "lang", "num_attr"]


def _full_rebuild_rows(spark, tmp_path, batches, name):
    """term_stats of a one-shot fresh build over the batches' union —
    the fold's equivalence oracle."""
    from yaii_spark.indexer import build_index

    full = batches[0]
    for b in batches[1:]:
        full = full.unionByName(b)
    out = str(tmp_path / name)
    build_index(
        spark, full, out, seg_size=16, stored_cols=_FOLD_STORED, resume=False
    )
    return _ts_rows(spark, out)


def test_incremental_term_stats_fold_matches_full(spark, tmp_path, monkeypatch):
    """Appending a micro-batch folds ONLY the new segments' aggregates
    into the bucketed dictionary (indexer._fold_term_stats) — per-batch
    cost O(batch), not O(index) (VERDICT r4 #1) — and the folded rows
    are value-identical to a full recompute over the union. The full
    path is monkeypatch-poisoned for the second batch, so the test
    FAILS if the fold silently falls back to the O(index) recompute;
    a replayed batch folds nothing (ledger already covers its range)."""
    import yaii_spark.indexer as IX
    from yaii_spark.storage import fs_exists, read_table
    from yaii_spark.streaming import make_append_committer

    idx = str(tmp_path / "fold_idx")
    commit = make_append_committer(idx, seg_size=16, stored_cols=_FOLD_STORED)
    b1 = gen_pages(spark, 60, include_fixtures=True)
    b2 = gen_pages(spark, 100, include_fixtures=False).filter(F.col("doc_id") >= 60)
    commit(b1, 0)  # base build: full recompute + ledger bootstrap
    assert fs_exists(spark, f"{idx}/stats_ledger")

    def _boom(*a, **k):
        raise AssertionError("append must fold, not full-recompute")

    monkeypatch.setattr(IX, "_write_term_stats_full", _boom)
    commit(b2, 1)  # incremental fold
    monkeypatch.undo()

    # ledger covers every durable segment exactly once
    n_segs = read_table(spark, f"{idx}/seg_meta").select("seg_id").distinct().count()
    led = read_table(spark, f"{idx}/stats_ledger")
    assert led.count() == led.distinct().count() == n_segs
    # no torn-fold marker, no leftover staging dir
    assert not fs_exists(spark, f"{idx}/stats_folding")
    assert not fs_exists(spark, f"{idx}/term_stats_delta_tmp")

    folded = _ts_rows(spark, idx)
    assert folded == _full_rebuild_rows(spark, tmp_path, [b1, b2], "fold_full")

    # corpus stats (n_docs, avgdl) now aggregate from the ledger's
    # (n_docs, sum_dl) rows — must equal the one-shot build's (dl are
    # integer token counts, so float sums are order-independent exact)
    cs = read_table(spark, f"{idx}/corpus_stats").collect()[0]
    cs_full = read_table(spark, str(tmp_path / "fold_full") + "/corpus_stats").collect()[0]
    assert cs.n_docs == cs_full.n_docs == 100
    assert abs(cs.avgdl - cs_full.avgdl) < 1e-9

    # replay of batch 1: everything already folded → dictionary unchanged
    monkeypatch.setattr(IX, "_write_term_stats_full", _boom)
    commit(b2, 1)
    monkeypatch.undo()
    assert _ts_rows(spark, idx) == folded


def test_torn_fold_recovers_with_full_recompute(spark, tmp_path):
    """A crash between the fold's bucket overwrite and its ledger append
    leaves the stats_folding marker; the next append must detect it and
    recover via the full recompute (correct counts, marker cleared)."""
    from yaii_spark.storage import fs_exists, fs_touch
    from yaii_spark.streaming import make_append_committer

    idx = str(tmp_path / "torn_idx")
    commit = make_append_committer(idx, seg_size=16, stored_cols=_FOLD_STORED)
    b1 = gen_pages(spark, 40, include_fixtures=True)
    b2 = gen_pages(spark, 70, include_fixtures=False).filter(F.col("doc_id") >= 40)
    commit(b1, 0)
    fs_touch(spark, f"{idx}/stats_folding")  # simulate the torn fold
    commit(b2, 1)
    assert not fs_exists(spark, f"{idx}/stats_folding")
    assert _ts_rows(spark, idx) == _full_rebuild_rows(
        spark, tmp_path, [b1, b2], "torn_full"
    )


def test_fold_self_heals_unfolded_segments(spark, tmp_path, monkeypatch):
    """Segments whose postings committed but whose stats fold never ran
    (crash after the postings write) are picked up by the NEXT batch's
    fold — `unfolded` is ledger-complement, not batch-scoped."""
    import yaii_spark.indexer as IX
    from yaii_spark.streaming import make_append_committer

    idx = str(tmp_path / "heal_idx")
    commit = make_append_committer(idx, seg_size=16, stored_cols=_FOLD_STORED)
    b1 = gen_pages(spark, 40, include_fixtures=True)
    b2 = gen_pages(spark, 70, include_fixtures=False).filter(F.col("doc_id") >= 40)
    b3 = gen_pages(spark, 100, include_fixtures=False).filter(F.col("doc_id") >= 70)
    commit(b1, 0)
    # batch 1's fold "crashes" before running: postings durable, stats not
    monkeypatch.setattr(IX, "_fold_term_stats", lambda *a, **k: None)
    commit(b2, 1)
    monkeypatch.undo()
    commit(b3, 2)  # must fold batch 1's AND batch 2's segments
    assert _ts_rows(spark, idx) == _full_rebuild_rows(
        spark, tmp_path, [b1, b2, b3], "heal_full"
    )


def test_append_after_merge_geometry_and_fold(spark, tmp_path):
    """Appending onto a MERGED index: (1) the pre-merge seg_size is
    REFUSED before any durable write — segment geometry is global
    (doc_id = seg_id*seg_size + local) and a mismatched range would
    collide with existing segments; (2) with the merged seg_size the
    batch folds incrementally onto the merge-seeded stats_ledger and
    every query over old∪new docs stays correct."""
    from yaii_spark.indexer import merge_segments
    from yaii_spark.ops.aggregations import index_size
    from yaii_spark.queries.executor import execute_boolean
    from yaii_spark.storage import IndexCatalog, read_table
    from yaii_spark.streaming import make_append_committer

    idx = str(tmp_path / "pm_idx")
    merged = str(tmp_path / "pm_merged")
    commit16 = make_append_committer(idx, seg_size=16, stored_cols=_FOLD_STORED)
    b1 = gen_pages(spark, 64, include_fixtures=True)
    commit16(b1, 0)
    with pytest.warns(RuntimeWarning):  # 2 segments < local parallelism
        merge_segments(spark, idx, merged, factor=2)
    assert IndexCatalog(spark, merged).corpus_stats().seg_size == 32

    # (1) stale geometry refused, nothing ledgered
    commit_stale = make_append_committer(
        merged, seg_size=16, stored_cols=_FOLD_STORED
    )
    with pytest.raises(ValueError, match="seg_size"):
        commit_stale(gen_pages(spark, 10, include_fixtures=False), 0)
    from yaii_spark.storage import fs_exists

    assert not fs_exists(spark, f"{merged}/sink_ledger")

    # (2) merged-geometry append folds onto the merged ledger
    commit32 = make_append_committer(merged, seg_size=32, stored_cols=_FOLD_STORED)
    b2 = gen_pages(spark, 100, include_fixtures=False).filter(F.col("doc_id") >= 64)
    commit32(b2, 0)
    cat = IndexCatalog(spark, merged)
    assert index_size(cat) == 100
    assert cat.corpus_stats().n_docs == 100
    # a fixture token from batch 1 and content from batch 2 both match
    assert execute_boolean(cat, A.token("lorem")).count() == 1
    n_led = read_table(spark, f"{merged}/stats_ledger").count()
    n_segs = read_table(spark, f"{merged}/seg_meta").select("seg_id").distinct().count()
    assert n_led == n_segs
    # dictionary covers old ∪ new exactly once: spot-check a term that
    # occurs in both halves against a direct postings aggregate
    ts = {
        (r.field, r.term): (r.df, r.cf)
        for r in read_table(spark, f"{merged}/term_stats").collect()
    }
    post = read_table(spark, f"{merged}/postings")
    agg = {
        (r.field, r.term): (r.df, r.cf)
        for r in post.groupBy("field", "term")
        .agg(F.sum("df_local").alias("df"), F.sum("cf_local").alias("cf"))
        .collect()
    }
    assert ts == agg


def test_future_mode_phrase(spark, stream_dir):
    """A FUTURE continuous query with a phrase leaf (the round-2 gap:
    compile_predicate used to raise on Phrase)."""
    sdf, _ = continuous_query(
        spark, A.phrase(["abc", "bcd"]), QueryMode.FUTURE, stream_dir, PAGES_SCHEMA,
    )
    gen_boolean_pages(spark).write.mode("append").parquet(stream_dir)
    out = _run_stream(spark, sdf, "fut_phrase")
    assert {r.doc_id for r in out.collect()} == {14}
