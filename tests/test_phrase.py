"""Phrase / proximity queries over stored positions, plus the P8
dictionary-scan predicates (TOKEN_RANGE / TEXT_CONTAINS).

The engine result is checked against BruteForceIndex, which re-derives
matches by exhaustive scan over the same analyzer's token streams —
positions here come from decoded pos_bin, so this is the test that the
stored position bytes round-trip into correct phrase semantics.
"""

import datetime as dt

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yaii_spark.indexer import build_index
from yaii_spark.oracle import BruteForceIndex, _phrase_match
from yaii_spark.queries import ast as A
from yaii_spark.queries.executor import _eval_phrase, execute_boolean
from yaii_spark.storage import IndexCatalog
from yaii_spark.synth import PAGES_SCHEMA, render_html, EPOCH

PHRASE_DOCS = {
    0: "alpha beta gamma",
    1: "beta alpha beta gamma",
    2: "alpha gamma beta",
    3: "alpha alpha alpha",
    4: "alpha x y beta",
    5: "beta alpha",
    6: "alpha the beta",  # stopword between: adjacency differs per field
    7: "delta epsilon",
}


@pytest.fixture(scope="module")
def phrase_index(spark, work_dir):
    out = f"{work_dir}/phrase_idx"
    rows = [
        (did, f"https://x.example/{did}", EPOCH + dt.timedelta(seconds=did),
         render_html(text), text, "en", did)
        for did, text in PHRASE_DOCS.items()
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    build_index(spark, pages, out, seg_size=3)  # 3 segments
    return IndexCatalog(spark, out)


@pytest.fixture(scope="module")
def brute():
    return BruteForceIndex(PHRASE_DOCS)


def ids(df):
    return {r.doc_id for r in df.collect()}


PHRASE_CASES = [
    A.phrase(["alpha", "beta"]),
    A.phrase(["alpha", "beta"], slop=1),
    A.phrase(["alpha", "beta"], slop=2),
    A.phrase(["beta", "alpha"]),
    A.phrase(["alpha", "alpha"]),
    A.phrase(["alpha", "alpha", "alpha"]),
    A.phrase(["alpha", "beta", "gamma"]),
    A.phrase(["alpha", "beta", "gamma"], slop=1),
    A.phrase(["alpha", "zzznone"]),
    A.phrase(["alpha"]),
    A.phrase(["alpha", "the", "beta"]),      # stopwords kept in text field
    A.phrase(["alpha", "beta"], "_all"),      # filtered stream: 6 matches
    A.and_(A.phrase(["alpha", "beta"]), A.token("gamma")),
    A.or_(A.phrase(["delta", "epsilon"]), A.phrase(["beta", "gamma"])),
    A.not_(A.phrase(["alpha", "beta"])),
]


@pytest.mark.parametrize("q", PHRASE_CASES, ids=lambda q: str(q)[:60])
def test_phrase_vs_brute(phrase_index, brute, q):
    assert ids(execute_boolean(phrase_index, q)) == brute.evaluate(A.rewrite(q))


def test_phrase_expected_sets(phrase_index):
    # hand-checked anchors (don't trust two implementations to agree on
    # the wrong answer)
    assert ids(execute_boolean(phrase_index, A.phrase(["alpha", "beta"]))) == {0, 1}
    # slop=2: doc2 "alpha gamma beta" (gap 1), doc4 gap 2, doc6 gap 1
    assert ids(execute_boolean(phrase_index, A.phrase(["alpha", "beta"], slop=2))) == {0, 1, 2, 4, 6}
    assert ids(execute_boolean(phrase_index, A.phrase(["alpha", "alpha"]))) == {3}
    assert ids(execute_boolean(phrase_index, A.phrase(["alpha", "beta"], "_all"))) == {0, 1, 6}


RANGE_CASES = [
    A.token_range("text", "alpha", "beta"),                      # [alpha, beta)
    A.token_range("text", "alpha", "beta", hi_inclusive=True),
    A.token_range("text", "b", "e"),
    A.token_range("text", None, "b"),
    A.token_range("text", "g", None),
    A.token_range("text", "alpha", "alpha", hi_inclusive=True),  # point range
    A.and_(A.token_range("text", "d", "f"), A.token("epsilon")),
    A.text_contains("amm"),
    A.text_contains("lph"),
    A.text_contains("zzz"),
    A.or_(A.text_contains("eps"), A.token("gamma")),
    A.not_(A.text_contains("a")),
]


@pytest.mark.parametrize("q", RANGE_CASES, ids=lambda q: str(q)[:60])
def test_dictionary_scans_vs_brute(phrase_index, brute, q):
    assert ids(execute_boolean(phrase_index, q)) == brute.evaluate(A.rewrite(q))


# -- property: vectorized phrase eval == exhaustive scan ---------------------

_vocab = ["a", "b", "c"]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.lists(st.sampled_from(_vocab), min_size=0, max_size=12), min_size=1, max_size=6),
    st.lists(st.sampled_from(_vocab), min_size=2, max_size=3),
    st.integers(0, 3),
)
def test_phrase_numpy_matches_exhaustive(docs, terms, slop):
    # build the per-segment pos_map the executor would decode
    pos_map = {}
    for d, toks in enumerate(docs):
        for t in set(toks):
            ids_list, plists = pos_map.setdefault(("text", t), ([], []))
            ids_list.append(d)
            plists.append(np.array([i for i, x in enumerate(toks) if x == t], dtype=np.uint64))
    pos_map = {
        k: (np.array(ids_list, dtype=np.int64), plists)
        for k, (ids_list, plists) in pos_map.items()
    }
    got = set(_eval_phrase(A.Phrase(terms, "text", slop), pos_map).tolist())
    want = {d for d, toks in enumerate(docs) if _phrase_match(toks, terms, slop)}
    assert got == want
