"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Schema matches BASELINE.json input_hint exactly:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
plus a derived ``doc_id:long`` (dense row number; at 10^12 scale the
composite ``(segment << 40) | local`` form — SURVEY.md §7.4.4) and an
optional ``num_attr:long`` for the numeric-predicate suite.

``html`` is rendered deterministically FROM ``text`` so the extraction
invariant (extract(html) == text, byte-identical per url) is checkable.
Everything is seeded (seed=42 convention) and generated distributed via
``spark.range`` — no driver-side materialization, scales to any row
count.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# Seeded vocabulary: ~200 terms with Zipf-ish frequency so df varies and
# WAND/MaxScore pruning actually triggers (FIXTURES.md §4).
_VOCAB_SIZE = 200
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _vocab() -> list[str]:
    rng = np.random.default_rng(42)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = set()
    out = []
    while len(out) < _VOCAB_SIZE:
        w = "".join(rng.choice(letters, size=int(rng.integers(3, 9))))
        if w not in words:
            words.add(w)
            out.append(w)
    return out


VOCAB = _vocab()

# reference corpus texts appear verbatim (FIXTURES.md §2)
FIXTURE_TEXTS = [
    "lorem ipsum",
    "dolor",
    "this is a demo",
    "and it is working",
    "  Leading   spaces\tand-hyphens,commas;colons:dots. ",
    "MiXeD CaSe ÉTÉ Straße İstanbul",
    "ufg about test",
]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("num_attr", T.LongType(), False),
    ]
)


def render_html(text: str) -> bytes:
    """Deterministic html FROM text; paragraph per newline (FIXTURES.md §1)."""
    paras = "".join(f"<p>{p}</p>" for p in text.split("\n"))
    return f"<html><head></head><body>{paras}</body></html>".encode("utf-8")


def gen_text(doc_id: int, hot_fraction: float = 0.0, tokens_range: tuple = (8, 64)) -> str:
    """Seeded Zipf sampling from VOCAB; deterministic per doc_id."""
    rng = np.random.default_rng(42 + doc_id)
    n = int(rng.integers(*tokens_range))
    # Zipf over vocabulary ranks
    ranks = rng.zipf(1.3, size=n)
    words = [VOCAB[(r - 1) % _VOCAB_SIZE] for r in ranks]
    if hot_fraction and rng.random() < hot_fraction:
        words.insert(int(rng.integers(0, len(words) + 1)), "hotterm")
    return " ".join(words)


def _gen_batch(pdf_iter, n_fixture: int, hot_fraction: float, tokens_range: tuple = (8, 64)):
    for pdf in pdf_iter:
        ids = pdf["id"].to_numpy()
        rows = {"doc_id": [], "url": [], "warc_ts": [], "html": [], "text": [], "lang": [], "num_attr": []}
        for i in ids:
            i = int(i)
            if i < n_fixture:
                text = FIXTURE_TEXTS[i]
            else:
                text = gen_text(i, hot_fraction, tokens_range)
            rows["doc_id"].append(i)
            rows["url"].append(f"https://site{i % 97}.example/doc/{i}")
            rows["warc_ts"].append(EPOCH + dt.timedelta(seconds=i))
            rows["html"].append(render_html(text))
            rows["text"].append(text)
            rows["lang"].append("en")
            rng = np.random.default_rng(1000 + i)
            rows["num_attr"].append(int(rng.integers(0, 1000)))
        yield pd.DataFrame(rows)


def gen_pages(
    spark: SparkSession,
    n: int,
    include_fixtures: bool = True,
    hot_fraction: float = 0.0,
    partitions: int | None = None,
    tokens_range: tuple = (8, 64),
) -> DataFrame:
    """Distributed deterministic pages table of n rows."""
    n_fixture = len(FIXTURE_TEXTS) if include_fixtures else 0
    rng_df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(
        lambda it: _gen_batch(it, n_fixture, hot_fraction, tokens_range),
        schema=PAGES_SCHEMA,
    )


# The four reference docs (test/system/test-index.ts:77-107 re-expressed
# per FIXTURES.md §3): url suffix ≙ yaii id, text carries the searchable
# tokens, num_attr ≙ number_data.
BOOLEAN_DOCS = [
    (12, "lorem ipsum abc ufg about test", 20),
    (13, "dolor efg", 30),
    (14, "this is a demo abc bcd", 25),
    (15, "and it is working hij", 10000000),
]


def gen_boolean_pages(spark: SparkSession) -> DataFrame:
    rows = [
        (
            did,
            f"https://site0.example/doc/{did}",
            EPOCH + dt.timedelta(seconds=did),
            render_html(text),
            text,
            "en",
            num,
        )
        for did, text, num in BOOLEAN_DOCS
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)
