from yaii_spark.queries.ast import (  # noqa: F401
    all_docs,
    and_,
    has_field,
    none,
    not_,
    number,
    number_range,
    or_,
    token,
)
from yaii_spark.queries.executor import execute_boolean  # noqa: F401
from yaii_spark.queries.bm25 import bm25_topk  # noqa: F401
