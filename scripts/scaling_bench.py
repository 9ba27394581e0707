"""Two-cluster-size scaling evidence (north_rule / BASELINE.md).

Runs bench.py twice in fresh subprocesses — local[8] and local[32] on
the same input — and writes throughput at both plus scaling efficiency
to BENCH/BASELINE.md. Efficiency = (docs_per_sec@32 / docs_per_sec@8) / 4.

Usage: python scripts/scaling_bench.py [sf_dir] [synth_docs]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str, synth_docs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_SYNTH_DOCS=str(synth_docs),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    synth_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 30000
    results = {}
    for cpus in (8, 32):
        print(f"--- local[{cpus}] ---", flush=True)
        results[cpus] = run_bench(cpus, sf_dir, synth_docs)
        print(json.dumps(results[cpus]), flush=True)

    t8 = results[8]["build"]["docs_per_sec"]
    t32 = results[32]["build"]["docs_per_sec"]
    build_eff = (t32 / t8) / 4
    q8 = results[8]["query_p50_sec"]
    q32 = results[32]["query_p50_sec"]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(f"""# BENCH baseline — two-cluster-size scaling evidence

Same job, same input ({synth_docs} synthetic Common-Crawl-style pages
for the index build; {sf_dir} documents corpus for the query set),
run at two parallelism levels per the north_rule sandbox protocol
(N=8 vs 4N=32 cores, single host, {datetime.date.today().isoformat()}).

| metric | local[8] | local[32] | scaling |
|---|---|---|---|
| index-build throughput (docs/sec) | {t8:,.0f} | {t32:,.0f} | speedup {t32 / t8:.2f}x, efficiency **{build_eff:.2f}** |
| index-build wall (sec) | {results[8]["build"]["wall_sec"]} | {results[32]["build"]["wall_sec"]} | |
| query p50 (sec, headline set) | {q8} | {q32} | |
| query total (sec, headline set) | {results[8]["value"]} | {results[32]["value"]} | |

Scaling-efficiency target: >= 0.8 from N to 4N (BASELINE.json).
Measured build efficiency: **{build_eff:.2f}**.

Note: query latencies at this SF are dominated by fixed Spark job
overhead (~0.1-1 s/stage), not data volume — the build throughput is
the scaling-sensitive number at sandbox scale. Raw JSON below.

```json
{json.dumps(results[8])}
{json.dumps(results[32])}
```
""")
    print(f"wrote {path}; build efficiency {build_eff:.2f}")


if __name__ == "__main__":
    main()
