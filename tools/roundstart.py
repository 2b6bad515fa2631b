"""Round-start smoke check: catch driver-side fixture drift BEFORE any
code is written (the round-4 lesson: the regenerated fixtures silently
changed events.ts from TIMESTAMP(NANOS) to MICROS and every events
reader broke — a schema dump at round start finds that in seconds,
a bench failure mid-round finds it in hours).

Usage:  python tools/roundstart.py  [sf_dir=/root/testdata/sf0.01]

Prints each table's parquet schema, flags anything that differs from
the LAST ROUND's recorded snapshot (tools/fixture_schemas.json, updated
on every run), replays the flagship query, then emits the rotation
window (COVERAGE.md "Rotation cadence") and checks it against
registry.DRIVER_PRIORITY. Exit 1 on schema drift, a broken flagship,
or a window divergence (at round start the registry must equal the
proposal; mid-round divergence just means "regenerate before round
end"), 0 otherwise — safe to run first thing, every round.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)
SNAP = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixture_schemas.json")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    current: dict[str, str] = {}
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        sch = pq.read_schema(path)
        current[t] = ", ".join(f"{f.name}:{f.type}" for f in sch)
        print(f"{t}: {current[t]}")

    drift = []
    if os.path.exists(SNAP):
        prev = json.load(open(SNAP))
        for t in TABLES:
            if prev.get(t) and prev[t] != current[t]:
                drift.append(t)
                print(f"\nDRIFT in {t}:\n  was: {prev[t]}\n  now: {current[t]}")
    with open(SNAP, "w") as fh:
        json.dump(current, fh, indent=1)

    # Flagship smoke: entry() end-to-end on a tiny session.
    from pyspark.sql import SparkSession

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        n = len(mod.entry(spark).collect())
        print(f"\nentry(): {n} rows — ok")
    except Exception as e:  # noqa: BLE001 - smoke check reports anything
        print(f"\nentry() FAILED: {e}")
        return 1
    finally:
        spark.stop()

    if drift:
        print(f"\nSCHEMA DRIFT in: {', '.join(drift)} — audit every reader"
              " of those tables (see catalog.normalize_event_ts for the"
              " r4 events.ts precedent) before writing new code.")
        return 1
    print("no drift; fixtures match the recorded snapshot")

    # Emit this round's driver window (COVERAGE.md "Rotation cadence"):
    # the window is a pure function of the tree — never-checked first,
    # then stale logic chains, then oldest evidence — so the judge can
    # predict it, and a divergence between the registry and the
    # proposal is loud. At round START the two must match; mid-round
    # edits legitimately create new staleness, which the round-end
    # regeneration (rotation_audit -> DRIVER_PRIORITY) folds in.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import rotation_audit

    from mcp_rag_server_spark.registry import DRIVER_PRIORITY

    _, no_row, stale, fresh = rotation_audit.audit()
    window = rotation_audit.proposed_window(no_row, stale, fresh)
    print(f"\nrotation window ({len(window)} queries, cadence order):")
    for i, name in enumerate(window):
        print(f"  {i + 1:2d}. {name}")
    if list(DRIVER_PRIORITY) == window:
        print("DRIVER_PRIORITY matches the proposal — window is current")
        return 0
    extra = set(DRIVER_PRIORITY) - set(window)
    missing = set(window) - set(DRIVER_PRIORITY)
    if extra or missing:
        detail = (f"registry-only: {sorted(extra)}; "
                  f"proposal-only: {sorted(missing)}")
    else:  # same 50 names, different cadence order
        i, a, b = next(
            (i, a, b)
            for i, (a, b) in enumerate(zip(DRIVER_PRIORITY, window))
            if a != b
        )
        detail = (f"same names, order diverges at position {i + 1}: "
                  f"registry has {a!r}, proposal has {b!r}")
    print(f"DRIVER_PRIORITY DIVERGES from the proposal ({detail}).\n"
          "At round start this is a failure (the round-end regeneration "
          "was skipped) — run tools/rotation_audit.py and update "
          "registry.DRIVER_PRIORITY. Mid-round, new edits legitimately "
          "create staleness; regenerate before round end.")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
