"""Detector for DuckDB-side nondeterminism in oracle texts (r13).

Root cause this hunts (found r13, the r12 verdict's roving dirty-sweep
MISMATCH): DuckDB's MULTITHREADED window sort places a NULL order key
nondeterministically — on the dirty fixture, an hourly series whose
window ORDER BY hour admits a NULL hour (an event with NULL ts and a
finite value) returned FOUR different value sets across 12 runs at
default threads, and the most common one coincides with Spark's
NULLS-FIRST result, which is why isolated dirty_sweep replays usually
MATCH and full sweeps mismatched a roving victim. threads=1 is
deterministic (true NULLS LAST), so a single default-threads run vs a
single threads=1 run flags the class with high probability: any
deterministic query is thread-count-invariant.

The same probe also catches tie-driven window nondeterminism (an
ORDER BY that underdetermines the row order), on clean or dirty data.

Usage:
    python tools/oracle_jitter_sweep.py [--sf-dir DIR] [name ...]
    # default: the dirty fixture (built fresh); no names = all oracles

Exit 1 if any query is flagged.
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_oracle_parity import canon_rows  # noqa: E402

from mcp_rag_server_spark.catalog import TABLES  # noqa: E402
from mcp_rag_server_spark.registry import load_all  # noqa: E402
from tools.dirty_fixture import build_dirty  # noqa: E402

DIRTY_DIR = "/tmp/spark_graft_dirty_sf"


def _run(sql: str, sf_dir: str, threads: int | None):
    con = duckdb.connect()
    try:
        if threads is not None:
            con.execute(f"SET threads={threads}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        df = con.execute(sql).fetchdf()
        return canon_rows(
            list(df.columns),
            [tuple(r) for r in df.itertuples(index=False, name=None)],
        )
    finally:
        con.close()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = None
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if sf_dir is None:
        sf_dir = build_dirty("/root/testdata/sf0.001", DIRTY_DIR)

    reg = load_all()
    names = args or sorted(n for n in reg if reg[n].oracle)

    flagged: list[str] = []
    errors: list[str] = []
    for name in names:
        sql = reg[name].oracle
        try:
            multi = _run(sql, sf_dir, None)
            single = _run(sql, sf_dir, 1)
        except Exception as e:  # noqa: BLE001 — designed-loud oracles raise
            errors.append(name)
            print(f"ERR    {name}: {type(e).__name__}: {str(e)[:100]}")
            continue
        if multi != single:
            flagged.append(name)
            diff_m = [r for r in multi if r not in set(single)][:3]
            diff_s = [r for r in single if r not in set(multi)][:3]
            print(f"JITTER {name}")
            for r in diff_m:
                print(f"       threads=N : {r}")
            for r in diff_s:
                print(f"       threads=1 : {r}")
        else:
            print(f"stable {name}")

    print("\n=== summary ===")
    print(f"stable: {len(names) - len(flagged) - len(errors)}")
    print(f"flagged (thread-count-variant): {len(flagged)}")
    for n in flagged:
        print(f"  {n}")
    print(f"errored (loud contract): {len(errors)}: {errors}")
    return 1 if flagged else 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except SystemExit:
        raise
    except Exception:
        traceback.print_exc()
        raise SystemExit(2)
