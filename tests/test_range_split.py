"""Doc-id-range fan-out for merged / few-segment indexes.

The per-segment evaluation task is the boolean/phrase unit of
parallelism, so an index merged down to fewer segments than cores
leaves cores idle (the round-4 1M probe measured dense phrases 2×
slower at 4 segments / 8 cores). ``_range_split_plan`` splits each
segment into R contiguous local doc-id ranges whose v5 block intervals
are byte-sliced JVM-side and evaluated independently; these tests pin
the split path to the default path's results — same queries, same
index, ``YAII_RANGE_SPLIT`` forced on vs off — across plain tokens,
boolean algebra, NOT/ALL universes, phrases (exact and slop), live
tombstones, and post-merge purge holes (deleted_bin).

R is chosen so boundaries cut INSIDE 128-doc blocks (w=80), which
exercises the boundary-block overlap masking on every cut.
"""

import datetime as dt

import pytest

from yaii_spark.indexer import build_index, delete_docs, merge_segments
from yaii_spark.queries import ast as A
from yaii_spark.queries.executor import _range_split_plan, execute_boolean
from yaii_spark.storage import CorpusStats, IndexCatalog
from yaii_spark.synth import EPOCH, PAGES_SCHEMA, render_html

N_DOCS, SEG = 800, 400  # 2 segments; "common" has 4 id-blocks per seg


QUERIES = {
    "token": A.token("common"),
    "rare": A.token("rareterm"),
    "and": A.and_(A.token("common"), A.token("w3")),
    "or": A.or_(A.token("w1"), A.token("w2")),
    "not": A.not_(A.token("w1")),
    "and_not": A.and_(A.token("common"), A.not_(A.token("w2"))),
    "all": A.all_docs(),
    "phrase": A.phrase(["alpha", "beta"]),
    "phrase3": A.phrase(["alpha", "x", "beta"]),
    "phrase_slop": A.phrase(["alpha", "beta"], slop=1),
}


def _pages(spark):
    rows = []
    for did in range(N_DOCS):
        words = ["common", f"w{did % 7}"]
        if did % 11 == 0:
            words += ["alpha", "beta"]
        if did % 13 == 0:
            words += ["alpha", "x", "beta"]
        if did % 17 == 0:
            words += ["the", "alpha", "the", "beta"]
        if did == 555:
            words += ["rareterm"]
        text = " ".join(words)
        rows.append(
            (did, f"https://x.example/{did}", EPOCH + dt.timedelta(seconds=did),
             render_html(text), text, "en", did)
        )
    return spark.createDataFrame(rows, PAGES_SCHEMA)


@pytest.fixture(scope="module")
def split_index(spark, work_dir):
    out = f"{work_dir}/range_split_idx"
    build_index(spark, _pages(spark), out, seg_size=SEG)
    return out


def _run_all(cat, monkeypatch, r):
    monkeypatch.setenv("YAII_RANGE_SPLIT", str(r))
    return {
        k: sorted(row.doc_id for row in execute_boolean(cat, q).collect())
        for k, q in QUERIES.items()
    }


def test_range_split_identity_fresh(spark, split_index, monkeypatch):
    cat = IndexCatalog(spark, split_index)
    base = _run_all(cat, monkeypatch, 0)
    split = _run_all(cat, monkeypatch, 5)  # w=80: cuts inside blocks
    assert base == split
    # the fixture actually exercises every shape
    assert len(base["rare"]) == 1 and len(base["phrase"]) > 0
    assert len(base["not"]) + len(QUERIES) > 0
    assert len(base["all"]) == N_DOCS


def test_range_split_identity_tombstones_and_merge(
    spark, split_index, work_dir, monkeypatch
):
    delete_docs(spark, split_index, [0, 399, 400, 555, 777])
    cat = IndexCatalog(spark, split_index)
    base = _run_all(cat, monkeypatch, 0)
    assert len(base["rare"]) == 0  # 555 tombstoned
    assert _run_all(cat, monkeypatch, 5) == base

    merged = f"{work_dir}/range_split_merged"
    with pytest.warns(RuntimeWarning):  # 1 seg < defaultParallelism
        merge_segments(spark, split_index, merged, factor=2)
    mcat = IndexCatalog(spark, merged)
    # merge purged the tombstones into deleted_bin holes; results are
    # unchanged, and the split path must respect the holes too
    assert _run_all(mcat, monkeypatch, 0) == base
    assert _run_all(mcat, monkeypatch, 7) == base


BM25_CASES = [
    (["common", "w3"], "or", False),
    (["common", "w3"], "or", True),   # density fallback → exact inside
    (["alpha", "w1"], "or", True),
    (["alpha", "w1"], "and", False),
    (["rareterm", "w5"], "or", True),
]


def _bm25_all(cat, monkeypatch, r):
    from yaii_spark.queries.bm25 import bm25_topk

    monkeypatch.setenv("YAII_RANGE_SPLIT", str(r))
    out = []
    for terms, mode, prune in BM25_CASES:
        rows = bm25_topk(cat, terms, k=13, mode=mode, prune=prune).collect()
        out.append([(row.doc_id, row.score) for row in rows])
    return out


def test_range_split_bm25_identity(spark, split_index, work_dir, monkeypatch):
    """BM25 (exact AND MaxScore-pruned) under the range split must be
    float-identical to the per-segment path — per-doc accumulation
    stays sorted-term-ordered inside the doc's owning range task, and
    boundary-block spill is dead-masked. Runs on the (possibly
    tombstoned) fixture index and on a purged 1-segment merge."""
    cat = IndexCatalog(spark, split_index)
    base = _bm25_all(cat, monkeypatch, 0)
    assert _bm25_all(cat, monkeypatch, 5) == base
    assert any(len(r) == 13 for r in base)  # k actually binds somewhere

    merged = f"{work_dir}/range_split_merged_bm25"
    monkeypatch.delenv("YAII_RANGE_SPLIT", raising=False)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        merge_segments(spark, split_index, merged, factor=2)
    mcat = IndexCatalog(spark, merged)
    assert _bm25_all(mcat, monkeypatch, 0) == base
    assert _bm25_all(mcat, monkeypatch, 7) == base


def test_range_split_gate(spark, split_index, monkeypatch):
    cat = IndexCatalog(spark, split_index)
    monkeypatch.delenv("YAII_RANGE_SPLIT", raising=False)
    # auto gate stays OFF on tiny fixtures: 400-doc segments are under
    # the 4-block minimum span, so R is capped to 1
    assert _range_split_plan(cat) is None
    monkeypatch.setenv("YAII_RANGE_SPLIT", "0")
    assert _range_split_plan(cat) is None
    monkeypatch.setenv("YAII_RANGE_SPLIT", "6")
    assert _range_split_plan(cat) == (6, 67)

    class _Fake:
        spark = cat.spark

        def corpus_stats(self):
            return CorpusStats(
                n_docs=1 << 20, avgdl=10.0, k1=1.2, b=0.75, seg_size=1 << 20
            )

    monkeypatch.delenv("YAII_RANGE_SPLIT", raising=False)
    # 1 merged segment on a 4-core session → R = WAVES×4 = 16 tasks
    # (4 waves of finer tasks — straggler packing, see
    # executor.RANGE_SPLIT_WAVES), W=seg_size/16
    assert _range_split_plan(_Fake()) == (16, 1 << 16)

    class _FakeAtScale(_Fake):
        def corpus_stats(self):
            return CorpusStats(
                n_docs=1 << 30, avgdl=10.0, k1=1.2, b=0.75, seg_size=1 << 16
            )

    # cluster scale: segments (2^14) >= cores → None; the default
    # per-segment path is untouched where it already saturates
    assert _range_split_plan(_FakeAtScale()) is None
