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
ORDER BY that underdetermines the row order), on clean or dirty data
— point --sf-dir at a clean fixture (e.g. /root/testdata/sf0.01) for
the clean-data pass of the round-close battery.

A single default-threads draw can coincide with the threads=1 order
(the same ~75% coincidence that hid the r12 roving MISMATCH), so the
default-threads side runs --reps times (default 3) and EVERY draw
must equal the threads=1 result (r13 advice).

Usage:
    python tools/oracle_jitter_sweep.py [--sf-dir DIR] [--reps N] [name ...]
    # default: the dirty fixture (built fresh); no names = all oracles

Exit 1 if any query is flagged; exit 2 on an unknown / oracle-less
name (user error, not a designed-loud contract refusal).
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
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if sf_dir is None:
        sf_dir = build_dirty("/root/testdata/sf0.001", DIRTY_DIR)

    reg = load_all()
    names = args or sorted(n for n in reg if reg[n].oracle)

    # A name typo is user error, not a designed-loud contract refusal —
    # report it apart from the ERR bucket and fail with a distinct code.
    unknown = [n for n in names if n not in reg or not reg[n].oracle]
    for n in unknown:
        kind = "not registered" if n not in reg else "rows-only (no oracle)"
        print(f"UNKNOWN {n}: {kind}")
    names = [n for n in names if n not in unknown]

    flagged: list[str] = []
    errors: list[str] = []
    for name in names:
        sql = reg[name].oracle
        try:
            single = _run(sql, sf_dir, 1)
            multis = [_run(sql, sf_dir, None) for _ in range(reps)]
        except Exception as e:  # noqa: BLE001 — designed-loud oracles raise
            errors.append(name)
            print(f"ERR    {name}: {type(e).__name__}: {str(e)[:100]}")
            continue
        bad = [m for m in multis if m != single]
        if bad:
            flagged.append(name)
            sset = set(single)
            diff_m = [r for r in bad[0] if r not in sset][:3]
            bset = set(bad[0])
            diff_s = [r for r in single if r not in bset][:3]
            print(
                f"JITTER {name} ({len(bad)}/{reps} default-thread draws"
                " diverge from threads=1)"
            )
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
    if unknown:
        print(f"unknown names (user error): {unknown}")
        return 2
    return 1 if flagged else 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except SystemExit:
        raise
    except Exception:
        traceback.print_exc()
        raise SystemExit(2)
