"""Stress the IVF probe assignment at its real dispatch-trigger sizing.

The fixture corpora never leave the nlist = 8 floor, so the
constant-state argmin path (clustering._probe_top2_argmin, taken when
the collect_list pick's estimated per-JVM aggregation state exceeds
CELL_PROBE_STATE_BUDGET) is exercised there only by forcing the budget
down. This tool builds a deterministic synthetic corpus large enough
that the state estimate itself crosses the budget in local mode
(N = 300k -> nlist = 293 -> ~2.6 GiB estimated list state > 1 GiB),
then:

  1. runs cell_probes() with NO overrides and asserts the plan took
     the argmin path (production dispatch at production sizing);
  2. re-runs with the budget lifted to force the collect_list path and
     asserts the two probe tables are IDENTICAL;
  3. checks the structural invariants (2 distinct probes per vector);
  4. reports wall time for each path — the honest datum behind the
     budget constant (recorded r10: argmin 294 s vs list 109 s, i.e.
     the constant-state form costs ~2.7x compute and exists purely for
     memory safety where the quadratic-in-N list state cannot fit).

Synthetic embeddings are pure hash functions of (vec_id, dim) — no
rand(), so re-runs and both paths see bit-identical input. Written as
multi-file parquet so the scan parallelizes like a production layout.

Usage: python tools/probe_path_stress.py [n_vectors=300000]
Not part of the pytest suite (minutes of fold work by design); run it
whenever cell_probes' path dispatch, the state model, or the budget
constant changes. Give the JVM headroom for the forced list pass:
SPARK_GRAFT_DRIVER_MEM=16g.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mcp_rag_server_spark.operators import clustering  # noqa: E402
from mcp_rag_server_spark.session import get_spark  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    nlist = clustering.n_cells(n)
    budget = clustering.CELL_PROBE_STATE_BUDGET

    spark = get_spark(app_name="probe-path-stress")
    spark.sparkContext.setLogLevel("ERROR")

    state = clustering._probe_list_state_bytes(n, nlist, spark)
    print(f"n_vectors={n} -> nlist={nlist}, estimated list state "
          f"{state >> 20} MiB/JVM vs budget {budget >> 20} MiB")
    if state <= budget:
        print("state under budget: the argmin path would not be the "
              "default at this sizing — raise n_vectors")
        return 1

    path = f"/tmp/spark_graft_probe_stress_{n}"
    shutil.rmtree(path, ignore_errors=True)
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), d -> CAST("
                "(pmod(hash(concat(CAST(id AS STRING), ':', "
                "CAST(d AS STRING))), 2000) - 1000) / 1000.0 AS FLOAT))"
            ).alias("embedding"),
        )
        .repartition(32)
        .write.parquet(path)
    )
    emb = spark.read.parquet(path)

    # 1+4: default dispatch at this sizing = argmin path
    df_arg = clustering.cell_probes(emb, n_vectors=n)
    plan = df_arg._jdf.queryExecution().analyzed().toString()
    assert "cp_b2" in plan and "cp_top" not in plan, (
        "state model did not dispatch to the argmin path"
    )
    t0 = time.perf_counter()
    rows_arg = df_arg.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.hash("vec_id", "cell").cast("long")).alias("sig"),
    ).collect()[0]
    t_arg = time.perf_counter() - t0
    print(f"argmin path:       {t_arg:7.1f}s  rows={rows_arg['n']} "
          f"sig={rows_arg['sig']}")

    # 2: force the list path (same arithmetic, growing agg state)
    clustering.CELL_PROBE_STATE_BUDGET = state + 1
    try:
        df_list = clustering.cell_probes(emb, n_vectors=n)
        plan = df_list._jdf.queryExecution().analyzed().toString()
        assert "cp_top" in plan, "forced list path not taken"
        t0 = time.perf_counter()
        rows_list = df_list.groupBy().agg(
            F.count("*").alias("n"),
            F.sum(F.hash("vec_id", "cell").cast("long")).alias("sig"),
        ).collect()[0]
        t_list = time.perf_counter() - t0
    finally:
        clustering.CELL_PROBE_STATE_BUDGET = budget
    print(f"collect_list path: {t_list:7.1f}s  rows={rows_list['n']} "
          f"sig={rows_list['sig']}")

    ident = (rows_arg["n"] == rows_list["n"]
             and rows_arg["sig"] == rows_list["sig"])
    print(f"probe tables identical (count + order-insensitive "
          f"hash-sum over (vec_id, cell)): {ident}")

    # 3: structural invariants on the default path, checked
    # distributed (no driver-side collect of N rows)
    bad = (
        clustering.cell_probes(emb, n_vectors=n)
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_probes"),
            F.countDistinct("cell").alias("n_cells"),
        )
        .where(
            (F.col("n_probes") != clustering.CELL_PROBES)
            | (F.col("n_cells") != clustering.CELL_PROBES)
        )
        .count()
    )
    print(f"vectors violating the 2-distinct-probes invariant: {bad}")

    shutil.rmtree(path, ignore_errors=True)
    ok = ident and bad == 0
    print("STRESS", "GREEN" if ok else "RED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
