"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Headline set = every registry entry tagged bench=True (one per operator
family: vector top-k, LSH dedup, TPC-H aggregates/joins, sessionization,
token stats), so a regression in any family moves the headline number.

Methodology: each query is executed N_RUNS times and the MINIMUM is
reported. First executions pay one-time whole-stage-codegen JIT (~2 s on
complex expressions — see BASELINE.md) and scheduler noise; the minimum
is the steady-state throughput, which is the number that scales to a
long-running 100 TB job and is stable across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mcp_rag_server_spark.registry import load_all
from mcp_rag_server_spark.session import get_spark
from tools.box_probe import _WARMUP, measure_index


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark(app_name="bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    bench_specs = {n: s for n, s in registry.items() if s.bench}

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session bring-up (the driver's interest is throughput).
    # The warm-up is box_probe's bench-like sequence because the probe
    # sentinels are only meaningful on a fully-warmed JVM (all twelve
    # warm-up queries are themselves in the timed set, re-timed
    # min-of-N below, so this changes no reported number).
    for w in _WARMUP:
        bench_specs[w].spark_fn(spark, sf_dir).collect()

    # Self-adjudication (r12 verdict item 4): bracket the timed set
    # with the four box_probe sentinels so an artifact recorded on a
    # degraded box carries its own invalidation evidence. Index ~1.0 =
    # trustworthy; >1.15 on either side = machine-contaminated numbers.
    probe_before = round(measure_index(spark, registry, sf_dir), 3)

    # Min-of-3 by default: two consecutive rounds recorded a
    # load-contaminated official bench (r6/r7 verdicts) — a third
    # sample materially improves the odds the minimum catches an idle
    # window when the box is busy. Still override with
    # SPARK_GRAFT_BENCH_RUNS for quick iteration.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in sorted(bench_specs):
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = bench_specs[name].spark_fn(spark, sf_dir)
            df.collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    probe_after = round(measure_index(spark, registry, sf_dir), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "probe_before": probe_before,
                "probe_after": probe_after,
            }
        )
    )


if __name__ == "__main__":
    main()
