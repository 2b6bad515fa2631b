"""Partition-invariance sweep: replay the full oracle contract under a
deliberately ODD parallelism (local[3], shuffle.partitions=3).

The registry's core promise is that every query's canonical rows are
independent of partitioning — no order-dependent float accumulation,
no partition-local tie-breaks. The driver and verify_contract.py both
run at local[8]/8, so a query that only happens to be deterministic at
that layout would slip through; this sweep is the counterfactual
layout. Any mismatch here with a green verify_contract run means an
order-dependent aggregate (the decimal-sum rules in the registry
docstring were skipped somewhere).

Usage: python tools/partition_sweep.py [sf_dir]   (~7 min at sf0.001)
Exit code 1 on any mismatch or error.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import duckdb
    from pyspark.sql import SparkSession

    from test_oracle_parity import canon_rows

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master("local[3]")
        .config("spark.sql.shuffle.partitions", "3")
        .config("spark.default.parallelism", "3")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf}/{t}.parquet')"
        )
    bad: list[str] = []
    unchecked: list[str] = []  # ran, but no oracle to compare against
    for name in sorted(qs):
        try:
            spdf = qs[name](spark, sf).toPandas()
            srows = [
                tuple(r) for r in spdf.itertuples(index=False, name=None)
            ]
            if name in osql:
                ddf = con.execute(osql[name]).fetchdf()
                drows = [
                    tuple(r)
                    for r in ddf.itertuples(index=False, name=None)
                ]
                if canon_rows(list(spdf.columns), srows) != canon_rows(
                    list(ddf.columns), drows
                ):
                    bad.append(name)
                    print("MISMATCH", name)
            else:
                unchecked.append(name)
        except Exception as e:  # noqa: BLE001 - sweep reports, not raises
            bad.append(name)
            print("ERROR", name, type(e).__name__, str(e)[:160])
    compared = len(qs) - len(unchecked) - len(bad)
    print(
        f"swept {len(qs)} queries at local[3]/3: {compared} compared and"
        f" matched, {len(unchecked)} ran-but-no-oracle {unchecked},"
        f" {len(bad)} bad {bad}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
