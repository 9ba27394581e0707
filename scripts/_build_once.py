"""One timed index build at a given core count (scaling harness leg).

Usage: python scripts/_build_once.py <cpus> <pages_parquet_dir> <n_docs> [tok_lo] [tok_hi]
Prints one JSON line {"cpus", "wall_sec", "docs_per_sec"}.
Generates the corpus into <pages_parquet_dir> if absent (untimed).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    pages_dir = sys.argv[2]
    n_docs = int(sys.argv[3])
    tok_range = (
        (int(sys.argv[4]), int(sys.argv[5])) if len(sys.argv) > 5 else (8, 64)
    )

    from yaii_spark.session import get_spark
    from yaii_spark.synth import gen_pages
    from yaii_spark.indexer import build_index

    # shuffle + spill on tmpfs: models a cluster node's local NVMe;
    # the sandbox's shared virtual disk otherwise caps the 8-thread legs
    # at its bandwidth and the measurement stops being about the engine
    local_dir = "/dev/shm/spark-local"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        f"build{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.local.dir": local_dir},
    )
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        gen_pages(
            spark, n_docs, include_fixtures=False, partitions=64, tokens_range=tok_range
        ).write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    out = tempfile.mkdtemp(prefix="yaii_scalebuild_", dir="/dev/shm")
    try:
        t0 = time.time()
        build_index(spark, pages, f"{out}/idx", seg_size=1024,
                    stored_cols=["url", "lang"], resume=False)
        wall = time.time() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()
    print(json.dumps({"cpus": cpus, "wall_sec": round(wall, 2),
                      "docs_per_sec": round(n_docs / wall, 1)}))


if __name__ == "__main__":
    main()
