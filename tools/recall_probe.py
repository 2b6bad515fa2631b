"""Measure cell-probe blocking quality against exact ground truth.

Runs the SHIPPED DuckDB replay of clustering.cell_probes
(duckdb_cell_probes_cte — so this can never drift from the Spark
implementation it mirrors) and reports:

  - pair recall: fraction of all-pairs cosine>=THRESH ground-truth
    pairs whose two vectors share a probed cell, plus the candidate
    budget (number of blocked pairs);
  - kNN recall@K: per-vector fraction of the exact cosine top-K
    neighbors reachable through a shared probed cell, averaged.

These are the numbers recorded in clustering.py's constants block
(r8 verdict item 5: the refinement's recall lift must be measured,
not asserted). Usage:

    python tools/recall_probe.py [sf_dir]     # default sf0.01
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mcp_rag_server_spark.functions.vector import duckdb_cosine  # noqa: E402
from mcp_rag_server_spark.operators.clustering import (  # noqa: E402
    duckdb_cell_probes_cte,
)

THRESH = 0.35
K = 3

# the oracles' own cosine discipline (round-4, epsilon denominator) —
# shared helper, so the recorded recall numbers can never be measured
# with a silently different formula than the queries use
_COS = f"round({duckdb_cosine('a.embedding', 'b.embedding')}, 4)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{sf_dir}/embeddings.parquet')"
    )
    head = f"WITH {duckdb_cell_probes_cte()},"
    common = f"""
scored AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb, {_COS} AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
cand AS MATERIALIZED (
  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
  FROM probed a JOIN probed b ON a.cell = b.cell AND a.vec_id < b.vec_id
)"""
    nt, nh, nc = con.execute(
        head
        + common
        + f"""
SELECT (SELECT COUNT(*) FROM scored WHERE cos >= {THRESH}),
       (SELECT COUNT(*) FROM scored s JOIN cand c
          ON s.va = c.va AND s.vb = c.vb WHERE s.cos >= {THRESH}),
       (SELECT COUNT(*) FROM cand)
"""
    ).fetchone()
    rec = f"{nh / nt:.4f}" if nt else "n/a (no ground-truth pairs)"
    print(
        f"pair recall @ cos>={THRESH}: {nh}/{nt} = {rec}"
        f"  (candidate pairs: {nc})"
    )

    (knn,) = con.execute(
        head
        + common
        + f"""
, sym AS (
  SELECT va AS v, vb AS w, cos FROM scored
  UNION ALL SELECT vb, va, cos FROM scored
),
topk AS (
  SELECT v, w FROM (
    SELECT v, w, row_number() OVER (
      PARTITION BY v ORDER BY cos DESC, w ASC) AS rn
    FROM sym) WHERE rn <= {K}
),
csym AS (
  SELECT va AS v, vb AS w FROM cand
  UNION ALL SELECT vb, va FROM cand
),
hit AS (
  SELECT t.v, COUNT(c.w) AS nh
  FROM topk t LEFT JOIN csym c ON t.v = c.v AND t.w = c.w
  GROUP BY t.v
)
SELECT AVG(nh / {K}.0) FROM hit
"""
    ).fetchone()
    print(f"kNN recall@{K}: {knn:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
