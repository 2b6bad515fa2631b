"""Per-query optimization profiler (round 14).

For each named bench query: time DataFrame CONSTRUCTION (Python-side
build + any eager actions hidden in the operator, e.g. localCheckpoint
stages or count memos), dump `.explain("formatted")` to
plans/r14/<name>_<tag>.txt, then time the full run (construction +
collect) min-of-N on a warmed session — the bench's own methodology —
plus a noop-sink run to separate compute from result collection.

Usage: python tools/opt_profile.py <tag> <query> [query ...]
       (tag = 'before' or 'after'; plans land in plans/r14/)
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mcp_rag_server_spark.registry import load_all  # noqa: E402
from mcp_rag_server_spark.session import get_spark  # noqa: E402
from tools.box_probe import _WARMUP  # noqa: E402

N_RUNS = 5


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="opt_profile", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    for w in _WARMUP:
        reg[w].spark_fn(spark, sf_dir).collect()

    for name in names:
        spec = reg[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # construction (includes any eager sub-actions the operator runs)
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        best_full, best_noop = float("inf"), float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            d = spec.spark_fn(spark, sf_dir)
            d.collect()
            best_full = min(best_full, time.perf_counter() - t0)
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            d = spec.spark_fn(spark, sf_dir)
            d.write.format("noop").mode("overwrite").save()
            best_noop = min(best_noop, time.perf_counter() - t0)
        print(
            f"{name:32s} build {t_build:6.3f}  "
            f"full(min{N_RUNS}) {best_full:6.3f}  "
            f"noop(min{N_RUNS}) {best_noop:6.3f}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
