"""Stress the IVF probe assignment at real large-nlist sizing.

The fixture corpora never leave the nlist = 8 floor, so the shipped
per-row fold top-2 (clustering.cell_probes, r10 form: ONE-row
broadcast centroid array, zero shuffles, constant accumulator) is
exercised at scale only here. This tool builds a deterministic
synthetic corpus far off the floor (N = 300k -> nlist = 293) and:

  1. runs the shipped cell_probes end-to-end;
  2. runs the r5-r9 REFERENCE picker (_probe_reference_list:
     centroid-TABLE crossJoin + vec_id shuffle + collect_list
     sort-slice — per-key state nlist structs, quadratic in N total)
     over the SAME refined centroids and asserts the two probe tables
     are IDENTICAL;
  3. checks the structural invariants (2 distinct probes per vector);
  4. reports wall time for each form.

History of this comparison (all figures N=300k / nlist=293, sf-style
64-dim vectors, local[32], idle):
  - r5-r9 collect_list groupBy pick:            109 s  (full pipeline)
  - r10-interim min(struct) argmin taken twice: 294 s  (full pipeline)
  - r10 shipped per-row fold:                   measured by this tool
The fold form needs no memory-model dispatch: its state is a 4-field
accumulator per row at ANY nlist, its only transient is the
nlist-element scored array per row, and it is the fastest of the
three — which is why it is the only path.

Synthetic embeddings are pure hash functions of (vec_id, dim) — no
rand(), so re-runs and both forms see bit-identical input. Written as
multi-file parquet so the scan parallelizes like a production layout.

Usage: python tools/probe_path_stress.py [n_vectors=300000]
Not part of the pytest suite (minutes of fold work by design); run it
whenever cell_probes' expressions change. Give the JVM headroom for
the reference form's aggregation state: SPARK_GRAFT_DRIVER_MEM=16g.
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
    print(f"n_vectors={n} -> nlist={nlist}")
    if nlist <= clustering.CELL_SEEDS:
        print("nlist is at the fixture floor — raise n_vectors")
        return 1

    spark = get_spark(app_name="probe-path-stress")
    spark.sparkContext.setLogLevel("ERROR")

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

    def sig_of(df):
        return df.groupBy().agg(
            F.count("*").alias("n"),
            F.sum(F.hash("vec_id", "cell").cast("long")).alias("sig"),
        ).collect()[0]

    # 1: shipped fold path, full pipeline
    t0 = time.perf_counter()
    shipped = sig_of(clustering.cell_probes(emb, n_vectors=n))
    t_fold = time.perf_counter() - t0
    print(f"shipped fold pipeline:   {t_fold:7.1f}s  rows={shipped['n']} "
          f"sig={shipped['sig']}")

    # 2: reference picker over the same refined centroids (full
    # pipeline too: centroids recomputed, aggregation-state pick)
    t0 = time.perf_counter()
    cent = clustering._refined_centroids(emb, nlist)
    ref = sig_of(clustering._probe_reference_list(emb, cent))
    t_ref = time.perf_counter() - t0
    print(f"reference list pipeline: {t_ref:7.1f}s  rows={ref['n']} "
          f"sig={ref['sig']}")

    ident = shipped["n"] == ref["n"] and shipped["sig"] == ref["sig"]
    print(f"probe tables identical (count + order-insensitive "
          f"hash-sum over (vec_id, cell)): {ident}")

    # 3: structural invariants on the shipped path, checked
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
