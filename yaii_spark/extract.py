"""HTML → text extraction (vectorized Arrow UDF).

north_rule per-row invariant: ``extract(html) == text`` byte-identical
per url (BASELINE.json input_hint). The synthetic html is rendered from
text by `synth.render_html`; extraction inverts it exactly: decode
utf-8, strip tags, paragraph breaks → newlines. Implemented as a pandas
UDF (batch regex, no per-row Spark UDF).

On real Common-Crawl WARC html you'd swap in a real extractor
(trafilatura etc. — not in this container); the UDF signature, schema
and batch shape are the production plumbing.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BODY = re.compile(rb"<body>(.*)</body>", re.S)
_P_SPLIT = re.compile(rb"</p><p>")
_P_TAG = re.compile(rb"</?p>")


def extract_text(html: bytes) -> str:
    """Inverse of synth.render_html — byte-identical text recovery."""
    m = _BODY.search(html)
    body = m.group(1) if m else b""
    body = _P_SPLIT.sub(b"\n", body)
    body = _P_TAG.sub(b"", body)
    return body.decode("utf-8")


def _extract_series(s: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_text(h) if h is not None else None for h in s],
        index=s.index,
        dtype=object,
    )


extract_text_udf = F.pandas_udf(_extract_series, T.StringType())


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
