"""Plan lint: sweep EVERY registry query's physical plan for scale
red flags, with an explicit, justified allowlist.

Flags checked:
  - CartesianProduct / non-broadcast nested loop over non-scalar sides
  - BatchEvalPython (row-at-a-time Python UDF — the banned slow path)
  - global Window (empty partition spec) — allowed only where the
    window input is provably bounded (documented per query below)

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
#: where the window input is bounded by construction.
ALLOW: dict[tuple[str, str], str] = {
    # bounded-input global rank/row_number windows
    ("rag_rrf_topk", "global_window"):
        "ranks over the per-query candidate pool (corpus-pruned at scale)",
    ("ta_zipf_fit", "global_window"):
        "rank over the distinct-token vocabulary (Heaps-sublinear)",
    ("ta_vocab_growth", "global_window"):
        "vocabulary-sized first-seen table",
    ("sim_matryoshka_topk", "global_window"):
        "per-width windows over the bounded top-k union",
    ("sim_ivfpq_topk", "global_window"):
        "coarse-cell ranking over k_cells rows",
    ("sim_ivf_recall", "global_window"):
        "recall ranks over bounded top-k unions per nprobe",
    ("sim_hyperplane_lsh", "global_window"):
        "bucket ranking over 2^n_planes rows",
    ("dd_lsh_band_audit", "global_window"):
        "audit ranks over the absolute 300-row sample",
    ("agg_percentile_audit", "global_window"):
        "percentile anchors over 3 probe rows",
    ("tpch_q15_top_supplier", "global_window"):
        "max over the per-supplier revenue aggregate",
    ("window_rank_analytics", "global_window"):
        "ranking-pack demo over the c_custkey<=200 slice",
    ("fileops_list_ext", "global_window"):
        "directory listing (reference tool surface, bounded by fanout)",
    ("fileops_reassemble_text", "global_window"):
        "chunks of ONE file (reference read_file surface)",
    ("read_range", "global_window"):
        "line slice of one file",
    ("chunk_udtf", "global_window"):
        "chunks of the UDTF demo corpus, presentation ids",
    ("ev_funnel", "global_window"):
        "single-row funnel summary",
    ("ta_mix_temperature", "global_window"):
        "per-source mixture table (|sources| rows)",
    ("chunks_table", "global_window"):
        "dense global chunk ids require one global order; the window"
        " input is ONE row per FILE (per-doc offsets), never the chunk"
        " set — test_chunks_table_id_window_is_per_file pins it",
    ("ta_dedup_budget_pipeline", "global_window"):
        "per-source budget windows after keyed dedup (partitioned by"
        " source; lint sees the md5 dedup window's hash partition only)",
}


def lint(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("cartesian")
    if "BatchEvalPython" in plan:
        flags.append("row_python")
    # windowspecdefinition with empty partition list: 'windowspecdefinition(x ASC'
    stripped = re.sub(r"#\d+L?", "", plan)
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", stripped):
        spec = m.group(1)
        # partition columns come before the first ORDER-BY entry; an
        # empty partition spec starts directly with a sort item
        first = spec.split(",")[0].strip()
        if first.endswith(("ASC NULLS FIRST", "DESC NULLS LAST",
                           "ASC NULLS LAST", "DESC NULLS FIRST")):
            flags.append("global_window")
            break
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
        for flag in lint(name, plan):
            if (name, flag) not in ALLOW:
                bad.append((name, flag))
    for name, flag in bad:
        print(f"VIOLATION {name}: {flag}")
    print(f"linted {len(reg)} plans: {len(bad)} unjustified violations,"
          f" {len(ALLOW)} allowlisted (each with a written bound)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
