"""Diff two bench.py JSON artifacts and flag per-query movement.

The r6–r8 verdicts each had to adjudicate load-contaminated bench
recordings by hand (grep the per-query maps, compute ratios, separate
broad-brush noise from single-query regressions). This makes that
analysis one command:

    python tools/bench_diff.py BENCH_r07.json BENCH_r08.json [--pct 25]

Prints: shared-query subtotals (the cross-round comparable number),
added/removed queries, and every shared query whose time moved more
than --pct in either direction, sorted by ratio. A BROAD movement
(most queries shifted the same way) usually means machine load on one
recording — check BENCH_NOTES for the idle reference; a NARROW one is
a real plan change.
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict[str, float]:
    """Accept either bench.py's raw one-line output or the driver's
    BENCH_r{N}.json wrapper (which nests it under "parsed")."""
    with open(path, encoding="utf-8") as fh:
        doc = json.load(fh)
    if "queries" in doc:
        return doc["queries"]
    if "parsed" in doc and "queries" in doc["parsed"]:
        return doc["parsed"]["queries"]
    raise SystemExit(
        f"{path}: unrecognized bench artifact — expected bench.py output"
        " (top-level 'queries' map) or a driver BENCH_r{{N}}.json wrapper"
        " ('parsed'->'queries')"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--pct",
        type=float,
        default=25.0,
        help="flag movement beyond this percent (default 25)",
    )
    args = ap.parse_args()

    a, b = load(args.old), load(args.new)
    shared = sorted(set(a) & set(b))
    added = sorted(set(b) - set(a))
    removed = sorted(set(a) - set(b))

    sub_a = sum(a[q] for q in shared)
    sub_b = sum(b[q] for q in shared)
    if not shared or sub_a == 0:
        print(
            f"shared {len(shared)} queries, old subtotal {sub_a:.2f}s —"
            " no comparable ratio (disjoint query sets or zeroed times)"
        )
    else:
        print(
            f"shared {len(shared)} queries: {sub_a:.2f}s -> {sub_b:.2f}s"
            f" (x{sub_b / sub_a:.2f})"
        )
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{q}={b[q]}" for q in added))
    if removed:
        print(f"removed ({len(removed)}): "
              + ", ".join(f"{q}={a[q]}" for q in removed))

    thresh = args.pct / 100.0
    moved = [
        (b[q] / a[q], q)
        for q in shared
        if a[q] > 0 and abs(b[q] / a[q] - 1.0) > thresh
    ]
    up = sum(1 for r, _ in moved if r > 1)
    down = len(moved) - up
    print(
        f"moved >{args.pct:.0f}%: {len(moved)} of {len(shared)}"
        f" ({up} slower, {down} faster)"
        + (
            " — BROAD shift, suspect machine load on one recording"
            if len(moved) > len(shared) // 3 and (up == 0 or down == 0)
            else ""
        )
    )
    for r, q in sorted(moved, reverse=True):
        print(f"  x{r:5.2f}  {q:34s} {a[q]:7.3f} -> {b[q]:7.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
