"""Fresh-session sentinel-normalized timing of the gated vector family
(r12 verdict item 3).

Question being adjudicated: the r12 judge's idle run read sim_ivfpq_topk
at x1.61 vs the r11 bench artifact, while the interleaved gated/ungated
A/B attributes only x1.16 to the r12 NaN-element gates — is the residual
~x1.2-1.3 a real code regression (shared PQ-CTE recompute) or box
condition?

Method (load-tolerant): in ONE fresh warmed session, interleave
min-of-5 timings of the four family queries with the four box_probe
sentinels (old code, pinned r11-artifact values available). Each
query's raw ratio vs its r11 artifact value is then NORMALIZED by the
same-session sentinel geomean index — sentinel drift is machine, so
the normalized ratio isolates the code-attributed movement. Normalized
ratio ≤ ~1.2 beyond the measured gate cost = environmental; higher =
real residual worth a checkpoint/hoist of the shared PQ codes subtree.

Usage: python tools/vector_family_ab.py
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mcp_rag_server_spark.registry import load_all  # noqa: E402
from mcp_rag_server_spark.session import get_spark  # noqa: E402
from tools.box_probe import _WARMUP, SENTINEL_REF  # noqa: E402

#: r11 bench artifact values (BENCH_r11.json, recorded on an in-band
#: box) — the comparison baseline the r12 verdict's x1.61 refers to.
R11_REF = {
    "sim_ivfpq_topk": 1.093,
    "sim_pq_adc_topk": 1.316,
    "sim_knn_graph": 1.137,
    "sim_kmeans_refine": 1.471,
}

#: Gate cost already adjudicated by the r12 interleaved gated/ungated
#: A/B (BENCH_NOTES): the expected code-attributed ratio from the
#: NaN-element gates alone.
GATE_COST = {
    "sim_ivfpq_topk": 1.16,
    "sim_pq_adc_topk": 1.13,
    "sim_knn_graph": 1.0,
    "sim_kmeans_refine": 1.0,
}


def _min_of(fn, n=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="vector-family-ab")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    for w in _WARMUP:
        reg[w].spark_fn(spark, sf_dir).collect()
    for q in R11_REF:
        reg[q].spark_fn(spark, sf_dir).collect()

    # Interleave: round-robin over (sentinels + family), 5 passes, keep
    # per-query minima — load spikes hit both groups alike.
    names = list(SENTINEL_REF) + list(R11_REF)
    best = {n: float("inf") for n in names}
    for _ in range(5):
        for n in names:
            t0 = time.perf_counter()
            reg[n].spark_fn(spark, sf_dir).collect()
            best[n] = min(best[n], time.perf_counter() - t0)

    sent_ratios = [best[n] / SENTINEL_REF[n] for n in SENTINEL_REF]
    box = math.exp(sum(math.log(r) for r in sent_ratios) / len(sent_ratios))
    print(f"sentinel box index this session: {box:.3f}")
    print(
        f"{'query':20s} {'r11':>6s} {'now':>6s} {'raw':>5s} "
        f"{'norm':>5s} {'gate':>5s} {'resid':>6s}"
    )
    worst = 0.0
    for n, ref in R11_REF.items():
        raw = best[n] / ref
        norm = raw / box
        resid = norm / GATE_COST[n]
        worst = max(worst, resid)
        print(
            f"{n:20s} {ref:6.3f} {best[n]:6.3f} {raw:5.2f} "
            f"{norm:5.2f} {GATE_COST[n]:5.2f} {resid:6.2f}"
        )
    # 1.2 is the documented ACTION threshold (docstring, BENCH_NOTES);
    # 1.2-1.3 is the ambiguous band — interleaving bounds load skew but
    # not perfectly, so a residual there warrants a re-run before code
    # action. Nonzero exit above 1.2 makes the tool gateable (r13
    # advice: the verdict cut and the documented threshold disagreed,
    # and the tool always exited 0).
    if worst <= 1.2:
        verdict = "residual within band — environmental, no code action"
        rc = 0
    elif worst <= 1.3:
        verdict = (
            "residual in the 1.2-1.3 ambiguous band — re-run on an idle"
            " box; code action only if it reproduces"
        )
        rc = 1
    else:
        verdict = "code-attributed residual >1.3 — checkpoint/hoist the PQ subtree"
        rc = 1
    print(f"worst gate-adjusted residual: {worst:.2f} — {verdict}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
