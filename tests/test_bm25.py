"""BM25 scored-retrieval suite (FIXTURES.md §4): rank-identical top-k
(doc_id AND score, tol 1e-9) vs the pure-Python oracle, on a seeded
Zipf corpus large enough that df varies across query terms.
"""

import pytest

from yaii_spark.indexer import build_index
from yaii_spark.oracle import BruteForceIndex
from yaii_spark.queries.bm25 import bm25_topk
from yaii_spark.storage import IndexCatalog
from yaii_spark.synth import VOCAB, gen_pages

N_DOCS = 1000


@pytest.fixture(scope="module")
def corpus(spark, work_dir):
    out = f"{work_dir}/bm25_idx"
    pages = gen_pages(spark, N_DOCS, include_fixtures=True)
    texts = {r.doc_id: r.text for r in pages.select("doc_id", "text").collect()}
    build_index(spark, pages, out, seg_size=256)  # 4 segments
    return IndexCatalog(spark, out), BruteForceIndex(texts)


def _freq_ordered_terms(oracle):
    from collections import Counter

    df = Counter()
    for toks in oracle.tokens.values():
        df.update(set(toks))
    common = [t for t, _ in df.most_common() if t in VOCAB][:20]
    rare = [t for t, _ in reversed(df.most_common()) if t in VOCAB][:20]
    return common, rare


def assert_topk_equal(got_rows, want, tol=1e-9):
    got = [(r.doc_id, r.score) for r in got_rows]
    assert [g[0] for g in got] == [w[0] for w in want], (got, want)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) <= tol, (gd, gs, ws)


@pytest.mark.parametrize("mode", ["or", "and"])
def test_bm25_single_and_multi_term(corpus, mode):
    cat, oracle = corpus
    common, rare = _freq_ordered_terms(oracle)
    queries = [
        [common[0]],
        [rare[0]],
        [common[0], common[5]],
        [common[0], rare[0]],
        [rare[0], rare[3]],
        [common[0], common[3], rare[1]],
    ]
    for q in queries:
        got = bm25_topk(cat, q, k=10, mode=mode).collect()
        want = oracle.bm25_topk(q, k=10, mode=mode)
        assert_topk_equal(got, want)


def test_bm25_absent_term(corpus):
    cat, oracle = corpus
    assert bm25_topk(cat, ["zzzznotaterm"], k=5).count() == 0
    # OR with one absent term: scores as if only present terms queried
    common, _ = _freq_ordered_terms(oracle)
    got = bm25_topk(cat, [common[0], "zzzznotaterm"], k=10, mode="or").collect()
    want = oracle.bm25_topk([common[0], "zzzznotaterm"], k=10, mode="or")
    assert_topk_equal(got, want)
    # AND with an absent term: empty
    assert bm25_topk(cat, [common[0], "zzzznotaterm"], k=5, mode="and").count() == 0


def test_bm25_duplicate_terms_scored_once(corpus):
    cat, oracle = corpus
    common, _ = _freq_ordered_terms(oracle)
    a = [(r.doc_id, r.score) for r in bm25_topk(cat, [common[0], common[0]], k=10).collect()]
    b = [(r.doc_id, r.score) for r in bm25_topk(cat, [common[0]], k=10).collect()]
    assert a == b


def test_bm25_deterministic_across_parallelism(corpus, spark):
    """Same floats regardless of shuffle partitioning (SURVEY.md §7.4.1)."""
    cat, _ = corpus
    common, rare = _freq_ordered_terms(BruteForceIndex({
        r.doc_id: r.text for r in cat.docs().select("doc_id", "text").collect()
    }))
    q = [common[0], rare[0]]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = [(r.doc_id, r.score) for r in bm25_topk(cat, q, k=10).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        b = [(r.doc_id, r.score) for r in bm25_topk(cat, q, k=10).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b


def test_bm25_pruned_with_tombstones(spark, work_dir):
    """MaxScore + deletes: tombstoning the current top docs must demote
    them in BOTH paths identically (dead-marking happens before any
    pruning decision), and pruned == exact after the delete."""
    from yaii_spark.indexer import build_index, delete_docs

    pages = gen_pages(spark, 600, include_fixtures=True)
    idx = f"{work_dir}/prune_tomb_idx"
    build_index(spark, pages, idx, seg_size=128)
    cat = IndexCatalog(spark, idx)
    oracle = BruteForceIndex(
        {r.doc_id: r.text for r in pages.select("doc_id", "text").collect()}
    )
    common, _ = _freq_ordered_terms(oracle)
    q = [common[0], common[3]]
    top_before = [r.doc_id for r in bm25_topk(cat, q, k=5, prune=True).collect()]
    delete_docs(spark, idx, top_before[:3])
    exact = [(r.doc_id, r.score) for r in bm25_topk(cat, q, k=10, prune=False).collect()]
    pruned = [(r.doc_id, r.score) for r in bm25_topk(cat, q, k=10, prune=True).collect()]
    assert exact == pruned
    got_ids = {d for d, _ in pruned}
    assert got_ids.isdisjoint(set(top_before[:3]))
    # oracle on the surviving docs agrees
    want = [
        (d, s)
        for d, s in oracle.bm25_topk(q, k=13)
        if d not in set(top_before[:3])
    ][:10]
    assert [d for d, _ in pruned] == [d for d, _ in want]


def test_lazy_block_decode_skips_blocks(spark, work_dir):
    """v4 lazy MaxScore: a rare+stopword-grade query on a skewed corpus
    must (a) return byte-identical results to the dense path and (b)
    decode strictly fewer posting blocks/bytes than exist — the hot
    term's non-candidate blocks are never touched (VERDICT r2 #5)."""
    import numpy as np

    from yaii_spark.queries import bm25 as B

    from pyspark.sql import functions as F

    # plant a df=3 rare term in three far-apart docs of a skewed corpus
    rare = "zzrareterm"
    pages = gen_pages(spark, 4000, hot_fraction=0.4, include_fixtures=False)
    pages = pages.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(10, 2000, 3999),
            F.concat(F.col("text"), F.lit(f" {rare}")),
        ).otherwise(F.col("text")),
    )
    idx = f"{work_dir}/lazy_idx"
    build_index(spark, pages, idx, seg_size=4096)  # one segment, many blocks
    cat = IndexCatalog(spark, idx)
    stats = cat.corpus_stats()
    hot_df = cat.term_stats_for([("text", "hotterm")])[("text", "hotterm")][0]
    assert hot_df > 1000  # skew is real: ~40% of 4000 docs

    # assemble the per-segment pdf exactly as the cogroup hands it over
    post = cat.postings([("text", rare), ("text", "hotterm")]).toPandas()
    meta = cat.seg_meta().collect()[0]
    pdf = post.assign(
        n_docs=meta.n_docs, base_doc_id=meta.base_doc_id, dl_bin=meta.dl_bin
    )
    idfs = {
        t: B.idf(stats.n_docs, df)
        for (_, t), (df, _) in cat.term_stats_for(
            [("text", rare), ("text", "hotterm")]
        ).items()
    }

    B.reset_decode_stats()
    pruned = B._score_segment_pruned(
        pdf, idfs, stats.k1, stats.b, stats.avgdl, k=3, block=stats.block_size
    )
    assert B.DECODE_STATS["blocks_total"] > 10  # hot term spans many blocks
    assert B.DECODE_STATS["blocks_decoded"] < B.DECODE_STATS["blocks_total"]
    assert B.DECODE_STATS["bytes_decoded"] < B.DECODE_STATS["bytes_total"]

    exact = B._score_segment(
        pdf, idfs, stats.k1, stats.b, stats.avgdl, k=3, mode="or",
        block=stats.block_size,
    )
    assert list(pruned["doc_id"]) == list(exact["doc_id"])
    assert np.allclose(pruned["score"], exact["score"], rtol=0, atol=0)


def test_bm25_pruned_equals_exact(corpus):
    """MaxScore/block-max pruning is rank-safe AND byte-identical
    (winners are rescored in sorted-term order)."""
    cat, oracle = corpus
    common, rare = _freq_ordered_terms(oracle)
    queries = [
        [common[0]],
        [common[0], common[5]],
        [common[0], rare[0]],
        [common[0], common[1], common[2], rare[2]],
        [rare[0], rare[1]],
    ]
    for q in queries:
        for k in (3, 10, 50):
            exact = [(r.doc_id, r.score) for r in bm25_topk(cat, q, k=k, prune=False).collect()]
            pruned = [(r.doc_id, r.score) for r in bm25_topk(cat, q, k=k, prune=True).collect()]
            assert exact == pruned, (q, k)
