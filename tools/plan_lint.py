"""Plan lint: sweep EVERY registry query's physical plan for scale
red flags, with an explicit, justified allowlist.

Flags checked:
  - CartesianProduct
  - BatchEvalPython (row-at-a-time Python UDF — the banned slow path)
  - global Window (empty partition spec) — allowed only where the
    window input is provably bounded (documented per query below);
    each allowlist entry also pins the EXPECTED occurrence count, so
    adding a second global window to an already-allowlisted query
    still fails until its bound is written here

(BroadcastNestedLoopJoin is deliberately NOT a blanket flag: it is the
correct plan for broadcast scalar/probe sides, and the per-query plan
tests pin the specific BNLJ shapes that are claimed — e.g.
sim_ann_topk's broadcast query batch, tpch_q11's 1-row scalar.)

The allowlist is the AUDIT: every entry names the query, the flag, and
why it is sound. A new violation fails the sweep, so adding one forces
writing the justification here.

Usage: python tools/plan_lint.py  (exit 1 on unjustified violations)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mcp_rag_server_spark.plans.inspect import plan_string  # noqa: E402
from mcp_rag_server_spark.registry import load_all  # noqa: E402
from mcp_rag_server_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

#: (query, flag) -> why it is sound. Global windows are listed only
#: where the window input is bounded by construction, and
#: ALLOW_GW_COUNT pins how many each query is allowed — one more than
#: the pinned count fails the sweep until its bound is written here.
#: (The first revision of this lint used a paren-truncating regex that
#: over-flagged 13 partitioned windows as global; the balanced parser
#: shrank the true global set to the five queries below.)
ALLOW: dict[tuple[str, str], str] = {
    ("chunks_table", "global_window"):
        "dense global chunk ids require one global order; the window"
        " input is ONE row per FILE (per-doc offsets), never the chunk"
        " set — test_chunks_table_id_window_is_per_file pins it",
    ("rag_rrf_topk", "global_window"):
        "lex + vec rank windows over the per-query candidate pool"
        " (corpus-pruned at scale)",
    ("ta_zipf_fit", "global_window"):
        "rank over the distinct-token vocabulary (Heaps-sublinear)",
    ("sim_ivf_recall", "global_window"):
        "recall ranks over bounded top-k unions per nprobe",
    ("sim_ivfpq_topk", "global_window"):
        "coarse-cell ranking over k_cells rows (x2: rank + prune)",
    ("ev_rfm_segments", "global_window"):
        "quintiles are by definition ranks over the whole user base;"
        " the window input is the per-user FEATURE table (one row per"
        " user, same bounded contract as chunks_table's per-file"
        " rows), and the at-scale substitute (approx-percentile bucket"
        " edges) is registered via agg_percentile_audit (x2: R/F —"
        " the dead M window was removed in r6)",
    ("ta_length_drift", "global_window"):
        "the corpus-wide CDF prefix runs over DISTINCT document"
        " lengths — bounded by the max doc length (a data-domain"
        " constant, ~hundreds of values), never by corpus row count;"
        " the per-source CDFs are source-partitioned windows",
    ("ta_quality_auc", "global_window"):
        "the cumulative-negatives prefix runs over the score BUCKET"
        " table — round(p_keep, 3) caps it at 1001 rows by"
        " construction regardless of corpus size",
    ("agg_skyline_2d", "global_window"):
        "the dominance prefix-max runs over the DISTINCT-PRICE table"
        " — bounded by the price grid (cents in a fixed band, ≤1001"
        " values), the ta_length_drift data-domain argument; the"
        " all-pairs dominance join this replaces is the quadratic"
        " textbook form",
    ("ta_gains_chart", "global_window"):
        "same ≤1001-row score-bucket bound as ta_quality_auc (x2: the"
        " cum_n and cum_pos sums share one ORDER BY s DESC spec)",
    ("ev_concurrency_curve", "global_window"):
        "both unpartitioned specs run over the per-day table —"
        " calendar-bounded like ev_msprt_sequential's (x2: the"
        " cross-day offset prefix + the 30-row overall-peak MAX,"
        " kept as a window so the peaks lineage evaluates ONCE); the"
        " corpus-sized sweep itself is day-partitioned",
    ("ev_slo_burn_rate", "global_window"):
        "the 6h trailing RANGE frame runs over the HOUR table —"
        " calendar-bounded (720 rows/month) like"
        " ev_msprt_sequential's day table (x2: the n and e trailing"
        " sums share one named window, two specdefinitions)",
    ("ev_msprt_sequential", "global_window"):
        "the cumulative-moments prefix runs over the DAY table —"
        " bounded by the calendar (30 rows here; a decade is 3653),"
        " never by event count (x6: the six per-arm n/Σ/Σ² sums share"
        " ONE Window node — test_msprt_window_runs_over_day_table"
        " pins it — but each is its own windowspecdefinition)",
}

ALLOW_GW_COUNT: dict[str, int] = {
    "chunks_table": 1,
    "rag_rrf_topk": 2,
    "ta_zipf_fit": 1,
    "sim_ivf_recall": 1,
    "sim_ivfpq_topk": 2,
    "ev_rfm_segments": 2,
    "ta_length_drift": 1,
    "ta_quality_auc": 1,
    "ev_msprt_sequential": 6,
    "ev_concurrency_curve": 2,
    "ev_slo_burn_rate": 2,
    "ta_gains_chart": 2,
    "agg_skyline_2d": 1,
}


def _balanced_spec(text: str, start: int) -> str:
    """The balanced-paren argument list of windowspecdefinition(
    starting at ``start`` (index of the opening paren)."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return text[start + 1 :]


def _first_toplevel_item(spec: str) -> str:
    """First comma-separated item at paren depth 0 (order-by keys may
    themselves contain parenthesized expressions with commas)."""
    depth = 0
    for i, c in enumerate(spec):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            return spec[:i].strip()
    return spec.strip()


def count_global_windows(plan: str) -> int:
    """Number of windowspecdefinition nodes with an EMPTY partition
    spec. Paren-balanced parsing: a first order-by key like
    unix_date(cast(d as date)) must not truncate the spec (a plain
    [^)]* regex here silently missed exactly that case)."""
    stripped = re.sub(r"#\d+L?", "", plan)
    n = 0
    for m in re.finditer(r"windowspecdefinition\(", stripped):
        spec = _balanced_spec(stripped, m.end() - 1)
        first = _first_toplevel_item(spec)
        # partition columns come before the first ORDER-BY entry; an
        # empty partition spec starts directly with a sort item
        if first.endswith(("ASC NULLS FIRST", "DESC NULLS LAST",
                           "ASC NULLS LAST", "DESC NULLS FIRST")):
            n += 1
    return n


def lint(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("cartesian")
    if "BatchEvalPython" in plan:
        flags.append("row_python")
    flags.extend(["global_window"] * count_global_windows(plan))
    return flags


def main() -> int:
    spark = get_spark(app_name="plan_lint", cpus=8, shuffle_partitions=8)
    reg = load_all()
    bad = []
    for name in sorted(reg):
        try:
            plan = plan_string(reg[name].spark_fn(spark, SF))
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"build error: {str(e)[:120]}"))
            continue
        flags = lint(name, plan)
        n_gw = flags.count("global_window")
        if n_gw:
            allowed = ALLOW_GW_COUNT.get(name, 0)
            if (name, "global_window") not in ALLOW:
                bad.append((name, f"global_window x{n_gw}"))
            elif n_gw > allowed:
                bad.append(
                    (name, f"global_window x{n_gw} exceeds the allowlisted"
                           f" {allowed} — write the new window's bound")
                )
        for flag in flags:
            if flag != "global_window" and (name, flag) not in ALLOW:
                bad.append((name, flag))
    for name, flag in bad:
        print(f"VIOLATION {name}: {flag}")
    print(f"linted {len(reg)} plans: {len(bad)} unjustified violations,"
          f" {len(ALLOW)} allowlisted (each with a written bound)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
