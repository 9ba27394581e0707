"""Index-build pipeline tests: the per-row extraction invariant
(north_rule), resumable builds (FIXTURES.md §6), and determinism across
parallelism levels (the sandbox evidence for the two-cluster-size rule).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from yaii_spark.extract import extract_text, with_extracted_text
from yaii_spark.indexer import build_index
from yaii_spark.queries.bm25 import bm25_topk
from yaii_spark.storage import IndexCatalog
from yaii_spark.synth import gen_pages, render_html


def test_extraction_invariant_roundtrip(spark):
    """extract(html) == text, byte-identical per url (input_hint)."""
    pages = gen_pages(spark, 200, include_fixtures=True)
    mism = (
        with_extracted_text(pages, out_col="text2")
        .filter(F.col("text2") != F.col("text"))
        .count()
    )
    assert mism == 0
    # multi-paragraph round-trip
    t = "para one\npara two\n\nthird"
    assert extract_text(render_html(t)) == t


def _postings_snapshot(spark, idx_dir):
    df = spark.read.parquet(f"{idx_dir}/postings").select(
        "seg_id", "term", "df_local", "cf_local",
        F.md5(F.hex("doc_ids_bin")).alias("ids_h"),
        F.md5(F.hex("tfs_bin")).alias("tfs_h"),
        F.md5(F.hex("pos_bin")).alias("pos_h"),
    )
    return sorted(tuple(r) for r in df.collect())


def test_resume_equals_clean_build(spark, work_dir):
    """Kill after half the segments; resumed build == clean build."""
    pages = gen_pages(spark, 400, include_fixtures=False)

    clean = f"{work_dir}/clean_idx"
    build_index(spark, pages, clean, seg_size=50)  # 8 segments

    resumed = f"{work_dir}/resumed_idx"
    m1 = build_index(spark, pages, resumed, seg_size=50, max_segments=4)
    assert m1["segments_built"] == 4
    m2 = build_index(spark, pages, resumed, seg_size=50)
    assert m2["segments_skipped"] == 4 and m2["segments_built"] == 4

    assert _postings_snapshot(spark, clean) == _postings_snapshot(spark, resumed)
    # stats identical too
    for t in ["term_stats", "corpus_stats", "seg_meta"]:
        a = sorted(map(str, spark.read.parquet(f"{clean}/{t}").drop("dl_bin").collect()))
        b = sorted(map(str, spark.read.parquet(f"{resumed}/{t}").drop("dl_bin").collect()))
        assert a == b, t


def test_rerun_is_idempotent(spark, work_dir):
    pages = gen_pages(spark, 100, include_fixtures=False)
    idx = f"{work_dir}/idem_idx"
    build_index(spark, pages, idx, seg_size=40)
    snap1 = _postings_snapshot(spark, idx)
    m = build_index(spark, pages, idx, seg_size=40)  # no-op resume
    assert m["segments_built"] == 0
    assert _postings_snapshot(spark, idx) == snap1


def test_build_deterministic_across_input_partitioning(spark, work_dir):
    """Same postings bytes whether the input arrives in 2 or 16 partitions
    — segment identity depends only on doc_id, never on partition layout."""
    a_dir, b_dir = f"{work_dir}/p2_idx", f"{work_dir}/p16_idx"
    build_index(spark, gen_pages(spark, 300, partitions=2), a_dir, seg_size=64)
    build_index(spark, gen_pages(spark, 300, partitions=16), b_dir, seg_size=64)
    assert _postings_snapshot(spark, a_dir) == _postings_snapshot(spark, b_dir)

    qa = [(r.doc_id, r.score) for r in bm25_topk(IndexCatalog(spark, a_dir), ["hotterm", "the"], k=10).collect()]
    qb = [(r.doc_id, r.score) for r in bm25_topk(IndexCatalog(spark, b_dir), ["hotterm", "the"], k=10).collect()]
    assert qa == qb


def test_checkpoint_lineage_rows(spark, work_dir):
    pages = gen_pages(spark, 120, include_fixtures=False)
    idx = f"{work_dir}/lineage_idx"
    build_index(spark, pages, idx, seg_size=60)
    ck = spark.read.parquet(f"{idx}/checkpoints")
    rows = {r.seg_id: r for r in ck.collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r.status == "done" and r.n_terms > 0 and r.wall_sec > 0


def test_hot_term_skew_and_partitioning_invariance(spark, work_dir):
    """FIXTURES.md §5: a stopword-grade hot term (≈40% of docs) must not
    change results across input partitionings — segmentation bounds the
    hot term's per-group size (the skew design, indexer.py docstring)."""
    a_dir, b_dir = f"{work_dir}/skew_a", f"{work_dir}/skew_b"
    build_index(spark, gen_pages(spark, 2000, hot_fraction=0.4, partitions=2),
                a_dir, seg_size=256)
    build_index(spark, gen_pages(spark, 2000, hot_fraction=0.4, partitions=16),
                b_dir, seg_size=256)
    assert _postings_snapshot(spark, a_dir) == _postings_snapshot(spark, b_dir)
    ca, cb = IndexCatalog(spark, a_dir), IndexCatalog(spark, b_dir)
    for cat in (ca, cb):
        n_hot = cat.term_stats_for([("text", "hotterm")])[("text", "hotterm")][0]
        assert 600 < n_hot < 1000  # ≈40% of 2000 ± randomness
    qa = [(r.doc_id, r.score) for r in bm25_topk(ca, ["hotterm"], k=20).collect()]
    qb = [(r.doc_id, r.score) for r in bm25_topk(cb, ["hotterm"], k=20).collect()]
    assert qa == qb


def test_term_stats_bucketed_pushdown(spark, work_dir):
    """Dictionary lookups must prune: bucket partition filter + term
    row-group filter both visible in the physical scan."""
    import io
    from contextlib import redirect_stdout

    from yaii_spark.storage import TERM_STATS_BUCKETS, term_stats_bucket

    idx = f"{work_dir}/ts_idx"
    build_index(spark, gen_pages(spark, 120, include_fixtures=True), idx, seg_size=60)
    cat = IndexCatalog(spark, idx)
    q = cat.term_stats_query([("text", "lorem")])
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain(mode="formatted")
    plan = buf.getvalue()
    b = term_stats_bucket("text", "lorem")
    assert "PartitionFilters" in plan and f"{b}" in plan
    assert "PushedFilters" in plan and "lorem" in plan
    # lookup correct + bucket stable
    stats = cat.term_stats_for([("text", "lorem")])
    assert stats[("text", "lorem")][0] > 0
    assert 0 <= b < TERM_STATS_BUCKETS


def test_term_stats_write_layout_and_values(spark, work_dir):
    """Invariants of the cores-wide dictionary write (the explicit
    repartition count that keeps AQE from collapsing the tiny stats
    shuffle to one task): each hash bucket must still land WHOLE in one
    write task — one file per bucket dir, so the in-bucket (field,
    term) row-group order the point-lookup pruning relies on survives —
    and the column-pruned postings read-back must produce term_stats
    identical to a direct aggregate of the postings table."""
    import glob
    import os

    idx = f"{work_dir}/ts_wide"
    build_index(
        spark, gen_pages(spark, 500, include_fixtures=True), idx, seg_size=100
    )
    bucket_dirs = glob.glob(os.path.join(idx, "term_stats", "bucket=*"))
    assert bucket_dirs  # partitioned layout present
    for d in bucket_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"bucket split across write tasks: {d}"
    want = {
        (r.field, r.term): (r.df, r.cf)
        for r in spark.read.parquet(os.path.join(idx, "postings"))
        .groupBy("field", "term")
        .agg(F.sum("df_local").alias("df"), F.sum("cf_local").alias("cf"))
        .collect()
    }
    got = {
        (r.field, r.term): (r.df, r.cf)
        for r in spark.read.parquet(os.path.join(idx, "term_stats")).collect()
    }
    assert got == want


def test_no_giant_in_list_for_pending_segments(spark, work_dir, monkeypatch):
    """No physical plan the build executes may carry a literal
    In(seg_id, [...]) / INSET list over the pending segments —
    selection must be a broadcast semi-join (at 10^6 pending segments
    an In-list would inline into the plan and evaluate O(n) per row).
    Asserted on the CAPTURED PHYSICAL PLANS of every DataFrame the
    build writes, not on source text."""
    import re

    import yaii_spark.indexer as ix

    plans = []
    real_write = ix.write_table

    def capturing_write(df, path, **kw):
        plans.append(
            (path, df._jdf.queryExecution().executedPlan().toString())
        )
        return real_write(df, path, **kw)

    monkeypatch.setattr(ix, "write_table", capturing_write)
    idx = f"{work_dir}/inlist_idx"
    pages = gen_pages(spark, 300, include_fixtures=False)
    build_index(spark, pages, idx, seg_size=10)  # 30 segments
    assert len(plans) >= 5  # docs, seg_meta, postings, term_stats, ck, stats
    seg_in = re.compile(r"(?:In|INSET)\s*\(?\s*seg_id", re.IGNORECASE)
    offenders = [
        (path, m.group(0))
        for path, plan in plans
        for m in [seg_in.search(plan)]
        if m
    ]
    assert offenders == [], offenders
    # and the semi-join is actually there on the postings-side plan
    post_plan = next(p for path, p in plans if path.endswith("postings"))
    assert "LeftSemi" in post_plan or "left_semi" in post_plan.lower()


def test_null_text_pages_index_as_token_free(spark, work_dir):
    """A page with NULL (or empty) text must index as a token-free doc
    (dl 0, no postings) instead of crashing the dl-blob encoder — the
    reference's termizer on a missing field yields no terms but the doc
    still exists."""
    from pyspark.sql import types as T

    from yaii_spark.queries import ast as A
    from yaii_spark.queries.executor import execute_boolean, search

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    rows = [(0, "alpha beta", "en"), (1, None, "en"), (2, "", "de"), (3, "beta", None)]
    idx = f"{work_dir}/nulltext_idx"
    build_index(
        spark, spark.createDataFrame(rows, schema), idx, seg_size=2,
        stored_cols=["lang"],
    )
    cat = IndexCatalog(spark, idx)
    got = lambda q: {r.doc_id for r in execute_boolean(cat, q).collect()}
    assert got(A.token("beta")) == {0, 3}
    assert got(A.all_docs()) == {0, 1, 2, 3}  # null-text docs still exist
    assert got(A.not_(A.token("alpha"))) == {1, 2, 3}
    assert got(A.has_field("lang")) == {0, 1, 2}
    # stored fields of the null-text doc are queryable
    assert [r.lang for r in search(cat, A.number_range("doc_id", 1, 2)).collect()] == ["en"]


def test_empty_input_build_raises(spark, work_dir):
    """Zero input rows (an upstream filter matched nothing) must fail
    loudly, not write a half-formed index that exists() misreports."""
    pages = gen_pages(spark, 50, include_fixtures=False).filter("doc_id < 0")
    with pytest.raises(ValueError, match="0 rows"):
        build_index(spark, pages, f"{work_dir}/empty_idx", seg_size=16)


def test_timestamp_range_predicate(spark, work_dir):
    """NumberRange over a TIMESTAMP attribute (the input_hint's warc_ts)
    — Catalyst comparisons + pushdown work on timestamps exactly like
    numerics, engine result == direct relational filter."""
    import datetime as dt

    from yaii_spark.queries import ast as A
    from yaii_spark.queries.executor import execute_boolean

    pages = gen_pages(spark, 150, include_fixtures=False)
    idx = f"{work_dir}/ts_pred_idx"
    build_index(spark, pages, idx, seg_size=64, stored_cols=["warc_ts"])
    cat = IndexCatalog(spark, idx)

    rows = sorted(r.warc_ts for r in pages.select("warc_ts").collect())
    lo, hi = rows[30], rows[110]
    want = {
        r.doc_id
        for r in pages.filter(
            (F.col("warc_ts") >= lo) & (F.col("warc_ts") < hi)
        ).collect()
    }
    got = {
        r.doc_id
        for r in execute_boolean(cat, A.number_range("warc_ts", lo, hi)).collect()
    }
    assert got == want and len(want) >= 50
    # open-ended + inclusive upper variants
    got_hi = {
        r.doc_id
        for r in execute_boolean(
            cat, A.number_range("warc_ts", None, lo, hi_inclusive=True)
        ).collect()
    }
    want_hi = {r.doc_id for r in pages.filter(F.col("warc_ts") <= lo).collect()}
    assert got_hi == want_hi
    assert isinstance(lo, dt.datetime)


def test_custom_rule_field_indexes_and_queries(spark, work_dir):
    """X1/F4: a make_rule_tokenizer analyzer wired into build_index via
    the fields map — the slow (explode+groupBy) path unions with the
    default fields' fast path, and the field is queryable."""
    import datetime as dt

    from yaii_spark.analyzer import make_rule_tokenizer
    from yaii_spark.queries import ast as A
    from yaii_spark.queries.executor import execute_boolean
    from yaii_spark.synth import EPOCH, PAGES_SCHEMA, render_html

    _, ref_udf = make_rule_tokenizer([
        ("ref", r"[@%&][A-Za-z0-9+/=]+\.[a-z0-9]+", False),
        ("word", r"[^\s\-,;:.]+", True),
    ])
    texts = {
        0: "Order @AB12.pdf shipped",
        1: "see &Zz99.txt and @AB12.pdf",
        2: "plain words only",
    }
    rows = [
        (i, f"https://x/{i}", EPOCH + dt.timedelta(seconds=i),
         render_html(t), t, "en", i)
        for i, t in texts.items()
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    idx = f"{work_dir}/rule_idx"
    build_index(
        spark, pages, idx, seg_size=2,
        fields={
            "text": ("text", "standard"),
            "_all": ("text", "all"),
            "refs": ("text", ref_udf),
        },
    )
    cat = IndexCatalog(spark, idx)
    # crypto refs kept whole + case-preserved in the rule field
    got = {r.doc_id for r in execute_boolean(cat, A.token("@AB12.pdf", "refs")).collect()}
    assert got == {0, 1}
    # words lowercased in the rule field
    got = {r.doc_id for r in execute_boolean(cat, A.token("order", "refs")).collect()}
    assert got == {0}
    # default fields unaffected: standard splits '@ab12' at '.'
    got = {r.doc_id for r in execute_boolean(cat, A.token("@ab12", "text")).collect()}
    assert got == {0, 1}


def test_icu_collated_sort_divergent_inputs(spark, work_dir):
    """F7: the reference sorts with Intl.Collator(sensitivity:'base')
    (utils.ts:41-46). UNICODE_CI_AI must produce that order on inputs
    where binary order disagrees."""
    import datetime as dt

    from yaii_spark.queries import ast as A
    from yaii_spark.queries.executor import REFERENCE_COLLATION, search
    from yaii_spark.synth import EPOCH, PAGES_SCHEMA, render_html

    langs = {0: "zebra", 1: "Apple", 2: "apple", 3: "Ärger", 4: "Banana"}
    rows = [
        (i, f"https://x/{i}", EPOCH + dt.timedelta(seconds=i),
         render_html("doc"), "doc", lang, i)
        for i, lang in langs.items()
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    idx = f"{work_dir}/coll_idx"
    build_index(spark, pages, idx, seg_size=10, stored_cols=["lang"])
    cat = IndexCatalog(spark, idx)

    got = [r.lang for r in search(cat, A.all_docs(), sort=[("lang", "asc")],
                                  collation=REFERENCE_COLLATION).collect()]
    # base sensitivity: Apple==apple (doc_id tiebreak), Ä sorts with A
    assert got == ["Apple", "apple", "Ärger", "Banana", "zebra"]
    binary = [r.lang for r in search(cat, A.all_docs(), sort=[("lang", "asc")]).collect()]
    assert binary == ["Apple", "Banana", "apple", "zebra", "Ärger"]


def test_multivalue_field(spark, work_dir):
    """FieldValues (array-valued field): per-element analysis with
    concatenated token streams (reference array termizer,
    base-inverted-index.ts:186-196)."""
    import datetime as dt

    from pyspark.sql import types as T

    from yaii_spark.analyzer import make_multivalue_analyzer
    from yaii_spark.queries import ast as A
    from yaii_spark.queries.executor import execute_boolean

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    rows = [
        (0, "body zero", ["Red Fox", "quick"]),
        (1, "body one", ["lazy dog"]),
        (2, "body two", None),
        (3, "body three", ["red", "fox"]),
    ]
    pages = spark.createDataFrame(rows, schema)
    _, mv_udf = make_multivalue_analyzer()
    idx = f"{work_dir}/mv_idx"
    build_index(
        spark, pages, idx, seg_size=2,
        fields={
            "text": ("text", "standard"),
            "_all": ("text", "all"),
            "tags": ("tags", mv_udf),
        },
    )
    cat = IndexCatalog(spark, idx)
    got = lambda q: {r.doc_id for r in execute_boolean(cat, q).collect()}
    assert got(A.token("fox", "tags")) == {0, 3}
    assert got(A.token("quick", "tags")) == {0}
    assert got(A.and_(A.token("red", "tags"), A.token("dog", "tags"))) == set()
    # concatenated stream: phrase across an element boundary matches
    # for doc 3 (["red", "fox"] → positions 0,1) — documented semantics
    assert got(A.phrase(["red", "fox"], "tags")) == {0, 3}

    # position_gap (Lucene positionIncrementGap analogue): the phrase
    # can no longer straddle the element boundary — doc 3's cross-
    # element match flips to no-match, doc 0's within-element match
    # stays, and in-element positions are untouched
    _, mv_gap = make_multivalue_analyzer(position_gap=2)
    idx2 = f"{work_dir}/mv_gap_idx"
    build_index(
        spark, pages, idx2, seg_size=2,
        fields={
            "text": ("text", "standard"),
            "_all": ("text", "all"),
            "tags": ("tags", mv_gap),
        },
    )
    cat2 = IndexCatalog(spark, idx2)
    got2 = lambda q: {r.doc_id for r in execute_boolean(cat2, q).collect()}
    assert got2(A.phrase(["red", "fox"], "tags")) == {0}
    assert got2(A.phrase(["red", "fox"], "tags", slop=1)) == {0}  # slop < gap
    assert got2(A.token("fox", "tags")) == {0, 3}  # tokens unaffected
    assert got2(A.phrase(["lazy", "dog"], "tags")) == {1}  # in-element intact


def test_multi_source_all_field(spark, work_dir):
    """yaii's addToAllField collects EVERY field's values into £_ALL
    (base-inverted-index.ts:141-161): a field-map source may be a LIST
    of columns whose token streams concatenate with sequential
    positions — a token query on _all matches either source."""
    from pyspark.sql import types as T

    from yaii_spark.queries import ast as A
    from yaii_spark.queries.executor import execute_boolean

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("title", T.StringType()),
        ]
    )
    rows = [
        (0, "body alpha", "Heading Omega"),
        (1, "body beta", None),
        (2, "gamma", "the heading"),
    ]
    pages = spark.createDataFrame(rows, schema)
    idx = f"{work_dir}/multi_all_idx"
    build_index(
        spark, pages, idx, seg_size=2,
        fields={
            "text": ("text", "standard"),
            "_all": (["text", "title"], "all"),
        },
    )
    cat = IndexCatalog(spark, idx)
    got = lambda q: {r.doc_id for r in execute_boolean(cat, q).collect()}
    # tokens from BOTH sources route into _all
    assert got(A.token("alpha", "_all")) == {0}
    assert got(A.token("omega", "_all")) == {0}
    assert got(A.token("heading", "_all")) == {0, 2}
    # null source contributes nothing (doc 1 still indexes its text)
    assert got(A.token("beta", "_all")) == {1}
    # the 'all' analyzer's stopword filter applies to every source
    assert got(A.token("the", "_all")) == set()
    # sequential concat positions: phrase across the source boundary
    # matches (addToAllField append semantics), in-source phrases too
    assert got(A.phrase(["alpha", "heading"], "_all")) == {0}
    assert got(A.phrase(["heading", "omega"], "_all")) == {0}
    # the single-source 'text' field is untouched by the multi-source map
    assert got(A.token("omega", "text")) == set()
    assert got(A.token("alpha", "text")) == {0}


def test_batched_group_encoder_matches_per_row_codec():
    """_encode_group_batched (one codec pass over a whole (seg, shard)
    group) must emit byte-identical posting rows to the straightforward
    per-row codec calls it replaced — randomized posting shapes incl.
    multi-block rows, multi-byte varints, and empty position lists."""
    import math
    import random

    import numpy as np

    from yaii_spark.codec import (
        block_offsets_from_lengths,
        delta_encode_blocked,
        varint_encode_blocked,
    )
    from yaii_spark.indexer import BLOCK_SIZE, _encode_group_batched, _tf_norm

    rng = random.Random(7)
    field_names = ["_all", "text"]
    avgdl, k1, b = 37.5, 1.2, 0.75
    items = []
    for r in range(40):
        n = rng.choice([1, 2, 5, BLOCK_SIZE - 1, BLOCK_SIZE, BLOCK_SIZE + 3, 3 * BLOCK_SIZE + 17])
        ids = sorted(rng.sample(range(0, 1 << 21), n))  # multi-byte deltas
        tfs = [rng.choice([1, 2, 3, 127, 128, 300]) for _ in range(n)]
        dls = [rng.randint(1, 200) for _ in range(n)]
        poss = [bytes(rng.randrange(256) for _ in range(rng.randint(0, 6))) for _ in range(n)]
        items.append(((r % 2, f"t{r:03d}".encode()), (ids, tfs, dls, poss)))

    got = _encode_group_batched(11, items, field_names, avgdl, k1, b)
    assert len(got) == len(items)
    for j, ((fid, term), (ids, tfs, dls, poss)) in enumerate(items):
        row = got.iloc[j]
        ids_a = np.array(ids, dtype=np.uint64)
        tfs_a = np.array(tfs, dtype=np.uint64)
        norms = _tf_norm(tfs_a, np.array(dls, dtype=np.int64), avgdl, k1, b)
        ids_bin, id_offs = delta_encode_blocked(ids_a, BLOCK_SIZE)
        tfs_bin, tf_offs = varint_encode_blocked(tfs_a, BLOCK_SIZE)
        nblocks = math.ceil(len(ids) / BLOCK_SIZE)
        assert row["seg_id"] == 11
        assert row["field"] == field_names[fid]
        assert row["term"] == term.decode()
        assert row["df_local"] == len(ids)
        assert row["cf_local"] == sum(tfs)
        assert bytes(row["doc_ids_bin"]) == ids_bin
        assert bytes(row["tfs_bin"]) == tfs_bin
        assert bytes(row["pos_bin"]) == b"".join(poss)
        assert row["block_id_offs"] == [int(x) for x in id_offs]
        assert row["block_tf_offs"] == [int(x) for x in tf_offs]
        assert row["block_first_ids"] == [int(x) for x in ids_a[::BLOCK_SIZE]]
        assert row["block_pos_offs"] == [
            int(x)
            for x in block_offsets_from_lengths(
                np.array([len(p) for p in poss], dtype=np.int64), BLOCK_SIZE
            )
        ]
        assert row["block_maxes"] == [
            float(norms[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max())
            for i in range(nblocks)
        ]
        assert row["max_norm"] == float(norms.max())
