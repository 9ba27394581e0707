"""Post-merge range-split probe (round 5).

Reproduces the round-4 probe pathology — a merged index with fewer
segments than cores caps phrase-eval parallelism (4 segments / 8 cores
measured dense phrase 13.8 s vs 7.0 s pre-merge) — and measures the
doc-id-range split fix (`executor._range_split_plan`): same queries on
the same merged index with the split disabled vs auto-gated, asserting
identical doc-id result hashes.

Protocol (BENCH/BASELINE.md 1M probe): local[8], tmpfs working dir,
gen_pages(1M, tokens_range=(150, 250), partitions=64), seg_size=65536
(16 segments), merge factor 4 → 4 segments. Dense phrase = the two
Zipf-densest VOCAB terms.

Usage: python scripts/probe_range_split.py [n_docs]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yaii_spark.session import get_spark  # noqa: E402
from yaii_spark.indexer import build_index, merge_segments  # noqa: E402
from yaii_spark.storage import IndexCatalog  # noqa: E402
from yaii_spark.queries import ast as A  # noqa: E402
from yaii_spark.queries.executor import (  # noqa: E402
    _range_split_plan,
    execute_boolean,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
ROOT = os.environ.get("PROBE_DIR", "/dev/shm/probe_range_split")

spark = get_spark("probe-range-split", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

pages_dir = f"{ROOT}/pages"
src = f"{ROOT}/idx"
dst = f"{ROOT}/idx_merged"

from yaii_spark.synth import gen_pages  # noqa: E402

if not os.path.exists(pages_dir + "/_SUCCESS"):
    gen_pages(
        spark, N, include_fixtures=False, partitions=64,
        tokens_range=(150, 250),
    ).write.mode("overwrite").parquet(pages_dir)
pages = spark.read.parquet(pages_dir)

if not os.path.exists(src + "/corpus_stats/_SUCCESS"):
    t0 = time.time()
    build_index(spark, pages, src, seg_size=65536)
    print(f"build: {time.time() - t0:.1f} s")

cat = IndexCatalog(spark, src)
# two Zipf-densest terms by global df
top = (
    cat.term_stats()
    .filter("field = 'text'")
    .orderBy("df", ascending=False)
    .limit(2)
    .collect()
)
hot1, hot2 = top[0].term, top[1].term
print(f"dense terms: {hot1} (df={top[0].df}), {hot2} (df={top[1].df})")

Q = {
    "phrase_dense": A.phrase([hot1, hot2]),
    "phrase_dense_slop2": A.phrase([hot1, hot2], slop=2),
}

# BM25 pairs: the dense pair rides the exact path (density fallback);
# the mid-rare pair exercises MaxScore block-max pruning under slicing
mids = (
    cat.term_stats()
    .filter("field = 'text'")
    .orderBy("df", ascending=False)
    .limit(120)
    .collect()
)
mid1, mid2 = mids[60].term, mids[119].term
print(f"mid terms: {mid1} (df={mids[60].df}), {mid2} (df={mids[119].df})")

from yaii_spark.queries.bm25 import bm25_topk  # noqa: E402

BQ = {
    "bm25_dense_exact": ([hot1, hot2], False),
    "bm25_mid_pruned": ([mid1, mid2], True),
}


def timed(cat, q, label):
    t0 = time.time()
    n = execute_boolean(cat, q).count()
    w = time.time() - t0
    print(f"  {label}: {w:.2f} s ({n} rows)")
    return w, n


def timed_bm25(cat, terms, prune, label):
    t0 = time.time()
    rows = bm25_topk(cat, terms, k=10, prune=prune).collect()
    w = time.time() - t0
    print(f"  {label}: {w:.2f} s (top {len(rows)})")
    return w, [(row.doc_id, row.score) for row in rows]


def run(cat, tag):
    print(f"[{tag}] range plan: {_range_split_plan(cat)}")
    out = {}
    for k, q in Q.items():
        out[k] = timed(cat, q, k)
    for k, (terms, prune) in BQ.items():
        out[k] = timed_bm25(cat, terms, prune, k)
    return out


# warm the catalog (dir listings) once, then measure
os.environ["YAII_RANGE_SPLIT"] = "0"
execute_boolean(cat, A.token(hot1)).count()
pre = run(cat, "pre-merge 16 segs, split off")

if not os.path.exists(dst + "/corpus_stats/_SUCCESS"):
    t0 = time.time()
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        merge_segments(spark, src, dst, factor=4)
    print(f"merge 16->4: {time.time() - t0:.1f} s")

mcat = IndexCatalog(spark, dst)
execute_boolean(mcat, A.token(hot1)).count()
post_off = run(mcat, "post-merge 4 segs, split OFF")
os.environ.pop("YAII_RANGE_SPLIT", None)
post_auto = run(mcat, "post-merge 4 segs, split AUTO")

for k in Q:
    assert post_off[k][1] == post_auto[k][1] == pre[k][1], (
        k, pre[k][1], post_off[k][1], post_auto[k][1]
    )
for k in BQ:
    # BM25: full (doc_id, score) float identity, not just counts
    assert post_off[k][1] == post_auto[k][1] == pre[k][1], (
        k, pre[k][1], post_off[k][1], post_auto[k][1]
    )
print("identity OK (pre-merge / post-off / post-auto; BM25 float-identical)")
for k in list(Q) + list(BQ):
    print(
        f"{k}: pre {pre[k][0]:.2f} s | post-merge off {post_off[k][0]:.2f} s"
        f" | post-merge auto-split {post_auto[k][0]:.2f} s"
        f" (x{post_off[k][0] / post_auto[k][0]:.2f})"
    )
