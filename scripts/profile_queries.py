"""Per-query profiling harness for the optimization rounds (bench.py is
frozen; extra measurements live here — guide §1.4/§1.5).

Mirrors bench.py's session (local[min(CPUS,8)], shuffle=cores, tmpfs
spark.local.dir) and, for each headline query:

  - warms once, then times N runs of .collect() (median + min)
  - optionally writes .explain("formatted") to plans/r06/<q>_<tag>.txt
  - labels jobs via setJobDescription

Usage:
  python scripts/profile_queries.py [--sf DIR] [--plans TAG] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q_token", "q_and", "q_or", "q_not",
    "q_phrase", "q_phrase_slop", "q_token_range",
    "q_bm25_rare", "q_bm25_mixed", "q_bm25_and", "q_bm25_pruned",
    "q_sort_limit", "q_group_by_lang",
    "q_dedup_exact", "q_minhash_sig", "q_simhash",
    "q_cosine_topk", "q_ann_lsh", "q_quality", "q_lang_id",
    "q_tpch_q1", "q_revenue_by_nation", "q_events_by_type",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--plans", default=None, help="write plans/r06/<q>_<TAG>.txt")
    ap.add_argument("--only", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from yaii_spark.session import get_spark
    from yaii_spark import entrypoint as EP

    cpus = min(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 8)
    local_dir = "/dev/shm/spark-local"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        "yaii-profile", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.local.dir": local_dir},
    )
    qs = EP.queries()
    names = args.only.split(",") if args.only else HEADLINE
    EP.get_index(spark, args.sf)

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = fn(spark, args.sf)
        if args.plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
        if args.repeats == 0:  # plans-only mode
            out[name] = {"median": 0.0, "min": 0.0, "runs": []}
            continue
        df.collect()  # warm
        runs = []
        for _ in range(args.repeats):
            t0 = time.time()
            fn(spark, args.sf).collect()
            runs.append(time.time() - t0)
        out[name] = {
            "median": round(statistics.median(runs), 4),
            "min": round(min(runs), 4),
            "runs": [round(r, 4) for r in runs],
        }
        print(f"{name:24s} median={out[name]['median']:.3f} min={out[name]['min']:.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)

    total_med = round(sum(v["median"] for v in out.values()), 4)
    total_min = round(sum(v["min"] for v in out.values()), 4)
    print(json.dumps({"sf": args.sf, "total_median": total_med, "total_min": total_min,
                      "queries": {k: v["median"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
