"""One-pass timing sweep of EVERY registered query at $SPARK_GRAFT_SF_DIR
(default sf0.1) — the r14 optimization round's coverage instrument: a
single construct+collect timing per query (bench methodology, no
min-of-N) to locate NON-BENCH outliers worth isolating. Not a bench:
numbers are single-draw and only good for ranking within one run.

Usage: python tools/registry_timing_sweep.py [top_n]
Prints every query slower than 1 s plus the top-N overall.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mcp_rag_server_spark.registry import load_all  # noqa: E402
from mcp_rag_server_spark.session import get_spark  # noqa: E402
from tools.box_probe import _WARMUP  # noqa: E402


def main() -> int:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="registry_timing_sweep", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    for w in _WARMUP:
        reg[w].spark_fn(spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in sorted(reg):
        spec = reg[name]
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            spec.spark_fn(spark, sf_dir).collect()
            times[name] = time.perf_counter() - t0
        except Exception as exc:  # loud-contract refusals on clean data
            print(f"{name}: ERR {type(exc).__name__}: {exc}", flush=True)
        spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)

    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    bench = {n for n, s in reg.items() if s.bench}
    print(f"\ntotal {sum(times.values()):.1f}s over {len(times)} queries")
    print(f"\ntop {top_n} (B = bench-tagged):")
    for name, sec in ranked[:top_n]:
        tag = "B" if name in bench else " "
        print(f"  {tag} {name:40s} {sec:7.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
