"""Snippet extraction over phrase matches (highlighting).

yaii itself has no highlighter; this is the Spark-side surface a
fulltext-index user expects next to phrase search, built the way
Lucene's UnifiedHighlighter does it: the INDEX decides which docs
match (posting intersection + stored-position verification — the
selective step), and the snippet is produced by re-analyzing the
STORED field for the matched docs only. Re-analysis is exact because
the analyzer is deterministic (byte-parity-tested tokenize), and it
keeps position payloads out of the highlight path entirely — the
phrase executor already consumed them.

Scale shape: phrase match → one projection join docs-side (matched ids
only) → Arrow-batched UDF doing O(|doc|) tokenization per MATCHED doc.
Never a corpus scan; never a per-row Python UDF over unmatched docs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from yaii_spark.analyzer import tokenize
from yaii_spark.queries import ast as A
from yaii_spark.queries.executor import execute_boolean
from yaii_spark.storage import IndexCatalog


def snippets(
    cat: IndexCatalog,
    terms: list[str],
    window: int = 3,
    field: str = "text",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, snippet) for every doc matching ``phrase(terms)`` in
    `field`: the `window` tokens either side of the FIRST exact match,
    re-tokenized from the stored `text_col`, joined with single
    spaces. Matching is index-driven (exact adjacency, slop=0); the
    UDF only locates the first occurrence inside docs the index
    already proved to match, so the snippet is non-null by
    construction when `field` is analyzed from `text_col` with the
    default tokenizer. If `field` was built with a DIFFERENT analyzer
    (or from another source column), the index can prove a match the
    re-analysis pass cannot locate — that mismatch now raises loudly
    from the snippet task instead of silently emitting
    (doc_id, NULL) rows (ADVICE r5)."""
    if not terms:
        raise ValueError("snippets: terms must be non-empty")
    t = [str(x).lower() for x in terms]
    k = len(t)
    hits = execute_boolean(cat, A.phrase(list(t), field_name=field))
    docs = cat.docs().select("doc_id", text_col)
    joined = hits.join(docs, "doc_id")

    @F.pandas_udf("string")
    def snip(texts: pd.Series) -> pd.Series:
        out = []
        for txt in texts:
            toks = tokenize(txt or "")
            i = next(
                (
                    j
                    for j in range(len(toks) - k + 1)
                    if toks[j : j + k] == t
                ),
                None,
            )
            if i is None:
                raise RuntimeError(
                    "snippets: index-proven phrase "
                    f"{t!r} not found when re-tokenizing the stored "
                    f"{text_col!r} column — the queried field was "
                    "likely built with a non-default analyzer or from "
                    "a different source column; snippets() requires "
                    "the default tokenization of text_col"
                )
            out.append(" ".join(toks[max(0, i - window) : i + k + window]))
        return pd.Series(out, dtype="object")

    return joined.select("doc_id", snip(F.col(text_col)).alias("snippet"))
