"""Oracle-parity sweep on the DIRTY fixture (tools/dirty_fixture.py).

Replays every registered query AND its DuckDB oracle on the dirty
variant of sf0.001 and classifies each:

    MATCH       both engines ran, canonical values identical
    MISMATCH    both ran, values differ — an engine-divergence on dirty
                input (NULL-semantics gap, undefined behavior) to fix
                or adjudicate
    SPARK_ERR   the Spark side raised — acceptable ONLY for queries
                with a documented loud input contract (e.g. the probe
                fold's null-embedding sentinel guard)
    ORACLE_ERR  the DuckDB side raised — the oracle text itself assumes
                clean input
    BOTH_ERR    both raised

The clean-fixture gate (verify_contract) proves the pair computes the
same thing on well-formed rows; this sweep probes what each query DOES
with the rows a 100 TB corpus inevitably contains. MATCH here is a
much stronger statement: the operator's null/empty/boundary behavior
is defined, deterministic, and engine-independent.

Usage:
    python tools/dirty_sweep.py [--json out.json] [name ...]
    # no names = full registry
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import traceback

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_oracle_parity import canon_rows  # noqa: E402

from mcp_rag_server_spark.catalog import TABLES  # noqa: E402
from tools.dirty_fixture import build_dirty  # noqa: E402

DIRTY_DIR = "/tmp/spark_graft_dirty_sf"


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]

    build_dirty("/root/testdata/sf0.001", DIRTY_DIR)

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    # Same contract as verify_contract.py: SPARK_GRAFT_EXTRA_CONFS="k=v,…"
    # lets bisects replay the sweep under e.g. the interpreted
    # (NO_CODEGEN) expression path.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONFS", "")
    for kv in filter(None, extra.split(",")):
        k, _, v = kv.partition("=")
        print(f"extra conf: {k.strip()}={v.strip()}")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    qs = mod.queries()
    osql = mod.oracle_sql()
    names = args or sorted(qs)

    results: dict[str, dict] = {}
    for name in names:
        spark_err = oracle_err = None
        scols = srows = dcols = drows = None
        try:
            spdf = qs[name](spark, DIRTY_DIR).toPandas()
            scols = list(spdf.columns)
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001 — classification sweep
            spark_err = f"{type(e).__name__}: {e}"
        if name in osql:
            con = duckdb.connect()
            try:
                for t in TABLES:
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{DIRTY_DIR}/{t}.parquet')"
                    )
                ddf = con.execute(osql[name]).fetchdf()
                dcols = list(ddf.columns)
                drows = [
                    tuple(r) for r in ddf.itertuples(index=False, name=None)
                ]
            except Exception as e:  # noqa: BLE001
                oracle_err = f"{type(e).__name__}: {e}"
            finally:
                con.close()
        else:
            oracle_err = "no oracle registered"

        dump = None
        if spark_err and oracle_err:
            cls = "BOTH_ERR"
        elif spark_err:
            cls = "SPARK_ERR"
        elif oracle_err:
            cls = "ORACLE_ERR"
        else:
            try:
                scanon = canon_rows(scols, srows)
                dcanon = canon_rows(dcols, drows)
                ok = scanon == dcanon
                if not ok:
                    # Forensics: a MISMATCH without the diverging values
                    # is undiagnosable from the artifact (r12 verdict
                    # item 2). Canonical rows are pipe-joined strings in
                    # sorted-column order, so a plain set diff names the
                    # exact cells that moved.
                    # prebuilt sets: membership inside the comprehension
                    # rebuilt set(...) per row, stalling exactly on large
                    # mismatching results (r13 advice)
                    dset, sset = set(dcanon), set(scanon)
                    only_s = [r for r in scanon if r not in dset]
                    only_d = [r for r in dcanon if r not in sset]
                    dump = {
                        "columns_sorted": sorted(scols or []),
                        "spark_only": only_s[:50],
                        "oracle_only": only_d[:50],
                        "spark_canon": scanon[:200],
                        "oracle_canon": dcanon[:200],
                    }
            except Exception as e:  # noqa: BLE001 — canon itself can choke
                ok = False
                spark_err = f"canon: {type(e).__name__}: {e}"
            cls = "MATCH" if ok else "MISMATCH"
        results[name] = {
            "class": cls,
            "spark_rows": len(srows) if srows is not None else None,
            "oracle_rows": len(drows) if drows is not None else None,
            "spark_err": spark_err,
            "oracle_err": oracle_err,
        }
        if dump is not None:
            results[name]["mismatch_dump"] = dump
            print(f"  -- MISMATCH {name}: cols {dump['columns_sorted']}")
            for r in dump["spark_only"][:6]:
                print(f"     spark_only : {r}")
            for r in dump["oracle_only"][:6]:
                print(f"     oracle_only: {r}")
        print(f"{cls:10s} {name}")

    by_cls: dict[str, list[str]] = {}
    for n, r in results.items():
        by_cls.setdefault(r["class"], []).append(n)
    print("\n=== summary ===")
    for cls in ("MATCH", "MISMATCH", "SPARK_ERR", "ORACLE_ERR", "BOTH_ERR"):
        members = by_cls.get(cls, [])
        print(f"{cls}: {len(members)}")
        if cls != "MATCH":
            for m in members:
                r = results[m]
                detail = r["spark_err"] or r["oracle_err"] or (
                    f"rows {r['spark_rows']} vs {r['oracle_rows']}"
                )
                print(f"  {m}: {detail}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except SystemExit:
        raise
    except Exception:
        traceback.print_exc()
        raise SystemExit(2)
