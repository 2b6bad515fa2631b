"""Iterative graph centrality as joins + aggregations (PageRank).

The dedup pack covers the *contraction* style of graph iteration
(star-contraction connected components, dedup.py); this module covers
the *propagation* style: power-iteration PageRank, the canonical
"rank ⋈ edges → re-aggregate" loop behind link analysis, influence
scoring, and graph-based data valuation. Each iteration is exactly two
distributed primitives —

  scatter: ranks ⋈ edges on src  → per-edge contribution rank·w/wout
  gather:  one shuffle keyed by dst → decimal-exact contribution sums

— so an iteration costs one keyed join plus one bounded shuffle. The
rank table is one row per node: it shuffles BY KEY with the edge list
(at 100 TB both sides hash-partition on src, and a pre-bucketed edge
table makes the scatter join exchange-free across all iterations —
same layout argument as ingest_bucketed_join). A fixed iteration count
keeps the whole computation SQL-expressible, so the DuckDB oracle
replays it CTE-for-CTE and the driver hash-checks real iterative graph
analytics, not just its plumbing.

The graph here is the event-type transition graph (same user-ordered
lead() edge derivation as ev_transition_matrix) — small, but the plan
shape is node-count-invariant: nothing below ever enumerates nodes on
the driver (node count rides as a broadcast 1-row aggregate).

Determinism discipline (registry rules): per-edge contributions are
IEEE double math in a fixed operand order (identical in both engines),
rounded to 9 and summed as DECIMAL(19,9) — order-independent — then
cast back to double for the damping update. Reference: Page et al.
1999 (the PageRank technical report); teleport term (1-d)/N with
d = 0.85. Every node in this graph has out-edges (it appears as a
transition source), so no dangling-mass redistribution is needed; a
corpus with sinks would add the standard dangling-sum broadcast term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.registry import register

#: Damping factor (Page et al. 1999) and fixed power-iteration count.
PR_DAMPING = 0.85
PR_ITERS = 3


def _pr_iter_sql(i: int) -> str:
    """One unrolled oracle iteration: scatter (c{i}), gather (s{i}),
    damping update (r{i})."""
    prev = f"r{i - 1}"
    return f"""
c{i} AS (
  SELECT e.dst AS node, r.rank * e.w / e.wout AS c
  FROM ewn e JOIN {prev} r ON r.node = e.src
),
s{i} AS (
  SELECT node, CAST(SUM(CAST(round(c, 9) AS DECIMAL(19,9))) AS DOUBLE) AS s
  FROM c{i} GROUP BY node
),
r{i} AS (
  SELECT n.node,
         CAST({1 - PR_DAMPING} AS DOUBLE) / nn.n
           + CAST({PR_DAMPING} AS DOUBLE)
             * COALESCE(s.s, CAST(0 AS DOUBLE)) AS rank
  FROM nodes n CROSS JOIN nn LEFT JOIN s{i} s ON n.node = s.node
)"""


_PR_ORACLE = f"""
WITH trans AS (
  SELECT event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
  -- sequence contract: an event with no user or no time has no
  -- position in a per-user event-time order (and NULL ts sorts
  -- FIRST in Spark windows vs LAST in DuckDB)
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
edges AS (
  SELECT src, dst, COUNT(*) AS w
  FROM trans WHERE dst IS NOT NULL GROUP BY src, dst
),
outw AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM edges GROUP BY src
),
ewn AS (
  SELECT e.src, e.dst, e.w, o.wout FROM edges e JOIN outw o ON e.src = o.src
),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst FROM edges
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
ne AS (SELECT COUNT(*) AS n_edges FROM edges),
r0 AS (
  SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes CROSS JOIN nn
),{",".join(_pr_iter_sql(i) for i in range(1, PR_ITERS + 1))}
SELECT r.node AS event_type,
       round(r.rank, 6) AS pagerank,
       nn.n AS n_nodes,
       ne.n_edges
FROM r{PR_ITERS} r CROSS JOIN nn CROSS JOIN ne
ORDER BY pagerank DESC, event_type
"""


@register(
    "ev_pagerank_types",
    oracle=_PR_ORACLE,
    description="power-iteration PageRank over the event-type transition"
    " graph (3 unrolled scatter/gather iterations, decimal-exact"
    " contribution sums, damping 0.85) — the rank ⋈ edges → re-aggregate"
    " loop of link analysis, hash-checked against the oracle's identical"
    " CTE chain",
    tags=("events", "graph", "iterative", "pagerank"),
)
def ev_pagerank_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power iteration with the damping update r' = (1-d)/N + d·Σ
    rank·w/wout. The edge+out-weight and node tables are built once and
    localCheckpoint'd — every iteration's scatter join re-scans the
    materialized result, and the checkpoint TRUNCATES LINEAGE so the
    physical plan of iteration i does not replay the window/groupBy
    chain i times (the same materialize-the-loop-invariant move as
    sql_recursive_reach and the star-contraction rounds; with a plain
    .cache() the static plan re-derived the subtree per iteration —
    75 exchanges in the PLANS.md dump vs 13 after). Contributions are summed per dst through
    round-9 DECIMAL(19,9) partials so the gather is order-independent;
    the (1-d)/N teleport and d·s update are fixed-operand-order IEEE
    double math, identical in DuckDB. N and |E| ride along as broadcast
    1-row aggregates (never a driver-side count), so the plan shape is
    unchanged when the node table is a billion users instead of five
    event types."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.expr("user_id IS NOT NULL AND ts IS NOT NULL")  # sequence contract
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type", 1).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    edges = trans.groupBy("src", "dst").agg(F.count("*").alias("w"))
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    # n_edges counts the EDGE TABLE (a NULL-typed source is a real node
    # whose edge the equi-join below drops from propagation on both
    # engines — the oracle's ne CTE counts edges pre-join too)
    edges = edges.localCheckpoint(eager=True)
    ewn = edges.join(outw, "src").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nn = nodes.agg(F.count("*").alias("n"))
    ne = edges.agg(F.count("*").alias("n_edges"))

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1).cast("double") / F.col("n")).alias("rank")
    )
    for _ in range(PR_ITERS):
        contrib = (
            ranks.withColumnRenamed("node", "src")
            .join(ewn, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("wout")).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(
            F.sum(F.round(F.col("c"), 9).cast("decimal(19,9)"))
            .cast("double")
            .alias("s")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(1 - PR_DAMPING).cast("double") / F.col("n")
                    + F.lit(PR_DAMPING)
                    * F.coalesce(F.col("s"), F.lit(0).cast("double"))
                ).alias("rank"),
            )
        )
    return (
        ranks.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ne))
        .select(
            F.col("node").alias("event_type"),
            F.round(F.col("rank"), 6).alias("pagerank"),
            F.col("n").alias("n_nodes"),
            "n_edges",
        )
        .orderBy(F.col("pagerank").desc(), "event_type")
    )


#: HITS (Kleinberg 1999) fixed iteration count. Two full hub/authority
#: rounds; like PR_ITERS this keeps the loop SQL-expressible so the
#: oracle replays it CTE-for-CTE.
HITS_ITERS = 2


def _hits_iter_sql(i: int) -> str:
    """One unrolled HITS iteration: authority gather from hubs, L1
    normalization, hub gather from authorities, L1 normalization. Every
    per-edge product is rounded to 9 and decimal-summed (the PageRank
    gather discipline), every normalization is one division by a
    decimal-exact total."""
    prev_h = f"h{i - 1}"
    return f"""
araw{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(CAST(round(h.score * e.w, 9) AS DECIMAL(19,9)))
              AS DOUBLE) AS s
  FROM ewn e JOIN {prev_h} h ON h.node = e.src
  GROUP BY e.dst
),
anorm{i} AS (
  SELECT CAST(SUM(CAST(round(s, 9) AS DECIMAL(19,9))) AS DOUBLE) AS t
  FROM araw{i}
),
a{i} AS (
  SELECT n.node, COALESCE(r.s, CAST(0 AS DOUBLE)) / an.t AS score
  FROM nodes n CROSS JOIN anorm{i} an
  LEFT JOIN araw{i} r ON r.node = n.node
),
hraw{i} AS (
  SELECT e.src AS node,
         CAST(SUM(CAST(round(a.score * e.w, 9) AS DECIMAL(19,9)))
              AS DOUBLE) AS s
  FROM ewn e JOIN a{i} a ON a.node = e.dst
  GROUP BY e.src
),
hnorm{i} AS (
  SELECT CAST(SUM(CAST(round(s, 9) AS DECIMAL(19,9))) AS DOUBLE) AS t
  FROM hraw{i}
),
h{i} AS (
  SELECT n.node, COALESCE(r.s, CAST(0 AS DOUBLE)) / hn.t AS score
  FROM nodes n CROSS JOIN hnorm{i} hn
  LEFT JOIN hraw{i} r ON r.node = n.node
)"""


_HITS_ORACLE = f"""
WITH trans AS (
  SELECT event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
  -- sequence contract: an event with no user or no time has no
  -- position in a per-user event-time order (and NULL ts sorts
  -- FIRST in Spark windows vs LAST in DuckDB)
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
edges AS (
  SELECT src, dst, COUNT(*) AS w
  FROM trans WHERE dst IS NOT NULL GROUP BY src, dst
),
ewn AS (SELECT src, dst, CAST(w AS DOUBLE) AS w FROM edges),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst FROM edges
),
h0 AS (SELECT node, CAST(1 AS DOUBLE) AS score FROM nodes),
{",".join(_hits_iter_sql(i) for i in range(1, HITS_ITERS + 1))}
SELECT a.node AS event_type,
       round(a.score, 6) AS authority,
       round(h.score, 6) AS hub
FROM a{HITS_ITERS} a JOIN h{HITS_ITERS} h ON h.node = a.node
ORDER BY authority DESC, event_type
"""


@register(
    "ev_hits_scores",
    oracle=_HITS_ORACLE,
    description="HITS hubs-and-authorities over the weighted event-type"
    " transition graph: two unrolled mutual-reinforcement iterations"
    " with L1 normalization — the second classical link-analysis"
    " fixpoint beside PageRank, separating 'sends traffic to important"
    " states' from 'receives it'",
    tags=("events", "graph", "iterative", "hits"),
)
def ev_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank collapses importance to one number; HITS (Kleinberg
    1999) keeps the two roles separate — a node's AUTHORITY is the
    hub-weight flowing in, a node's HUB score is the authority it
    points at — and the mutual recursion converges by alternating
    gathers. Each half-iteration is the same scatter/gather shape as
    ev_pagerank_types (one keyed join + one decimal-exact sum), plus
    an L1 normalization whose total rides as a broadcast 1-row
    aggregate. The edge table is localCheckpoint'd once; each score
    table is checkpoint'd per half-step because BOTH the next gather
    and its own normalization consume it — without truncation the
    lazy plan doubles per half-step (2^(2·iters) subtree blowup),
    the same lineage trap the determinism notes pin for .cache().
    At 100 TB: scores shuffle by node key beside a pre-bucketed edge
    table, identical to the PageRank layout argument."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.expr("user_id IS NOT NULL AND ts IS NOT NULL")  # sequence contract
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type", 1).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    ewn = (
        trans.groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        ewn.select(F.col("src").alias("node"))
        .union(ewn.select(F.col("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _gather(score, edge_from, edge_to):
        raw = (
            ewn.join(
                score.withColumnRenamed("node", edge_from), edge_from
            )
            .groupBy(F.col(edge_to).alias("node"))
            .agg(
                F.sum(
                    F.round(F.col("score") * F.col("w"), 9).cast(
                        "decimal(19,9)"
                    )
                )
                .cast("double")
                .alias("s")
            )
            .localCheckpoint(eager=True)
        )
        norm = raw.agg(
            F.sum(F.round(F.col("s"), 9).cast("decimal(19,9)"))
            .cast("double")
            .alias("t")
        )
        return (
            nodes.crossJoin(F.broadcast(norm))
            .join(raw, "node", "left")
            .select(
                "node",
                (
                    F.coalesce(F.col("s"), F.lit(0).cast("double"))
                    / F.col("t")
                ).alias("score"),
            )
            .localCheckpoint(eager=True)
        )

    hubs = nodes.select("node", F.lit(1).cast("double").alias("score"))
    for _ in range(HITS_ITERS):
        auths = _gather(hubs, "src", "dst")
        hubs = _gather(auths, "dst", "src")
    return (
        auths.withColumnRenamed("score", "authority")
        .join(hubs.withColumnRenamed("score", "hub"), "node")
        .select(
            F.col("node").alias("event_type"),
            F.round("authority", 6).alias("authority"),
            F.round("hub", 6).alias("hub"),
        )
        .orderBy(F.desc("authority"), "event_type")
    )


#: Absorption horizon steps reported by the conversion-odds readout.
ABS_STEPS = (1, 3, 6)
ABS_TARGET = "purchase"


def _abs_iter_sql(i: int) -> str:
    return f"""
a{i} AS (
  SELECT n.node,
         CASE WHEN n.node = '{ABS_TARGET}' THEN CAST(1 AS DOUBLE)
              ELSE COALESCE(s{i}.s, CAST(0 AS DOUBLE)) END AS p
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node,
           CAST(SUM(CAST(round(e.w / e.wout * a.p, 9)
                         AS DECIMAL(19,9))) AS DOUBLE) AS s
    FROM ewn e JOIN a{i - 1} a ON a.node = e.dst
    GROUP BY e.src
  ) s{i} ON s{i}.node = n.node
)"""


_ABS_ORACLE = f"""
WITH trans AS (
  SELECT event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
  -- sequence contract: an event with no user or no time has no
  -- position in a per-user event-time order (and NULL ts sorts
  -- FIRST in Spark windows vs LAST in DuckDB)
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
edges AS (
  SELECT src, dst, COUNT(*) AS w
  FROM trans WHERE dst IS NOT NULL GROUP BY src, dst
),
outw AS (
  SELECT src, CAST(SUM(w) AS DOUBLE) AS wout FROM edges GROUP BY src
),
ewn AS (
  SELECT e.src, e.dst, CAST(e.w AS DOUBLE) AS w, o.wout
  FROM edges e JOIN outw o ON o.src = e.src
  WHERE e.src <> '{ABS_TARGET}'
),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst FROM edges
),
a0 AS (
  SELECT node,
         CASE WHEN node = '{ABS_TARGET}' THEN CAST(1 AS DOUBLE)
              ELSE CAST(0 AS DOUBLE) END AS p
  FROM nodes
),
{",".join(_abs_iter_sql(i) for i in range(1, max(ABS_STEPS) + 1))}
SELECT a.node AS event_type,
       {", ".join(f"round(s{k}.p, 6) AS p_within_{k}"
                  for k in ABS_STEPS)}
FROM nodes a
{" ".join(f"JOIN a{k} s{k} ON s{k}.node = a.node" for k in ABS_STEPS)}
ORDER BY event_type
"""


@register(
    "ev_absorbing_conversion_prob",
    oracle=_ABS_ORACLE,
    description="absorbing-Markov conversion odds: probability of"
    " reaching the purchase state within 1/3/6 transitions from each"
    " starting state, by unrolled backward induction over the"
    " transition matrix with purchase made absorbing — the"
    " how-far-from-converting readout attribution models build on",
    tags=("events", "graph", "iterative", "funnel"),
)
def ev_absorbing_conversion_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Make the target state ABSORBING (drop its out-edges, pin its
    probability at 1) and the within-k conversion odds satisfy the
    backward recursion a_k(s) = Σ_t P(s,t)·a_{k-1}(t) — each unrolled
    step is one scatter/gather over the edge table, the
    PageRank/HITS shape with the round-9 decimal gather. The edge
    table and node list are localCheckpoint'd once (P is referenced
    by every level — inlined CTEs would re-derive the window+groupBy
    chain per step); six 5-row score tables ride the lazy chain.
    Growing horizon separates funnel positions honestly: p_within_1
    is the raw transition row, p_within_6 approaches the eventual
    absorption odds. At 100 TB the state space is whatever the
    vocabulary of states is — the per-step cost is |edges|, never
    |events|."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.expr("user_id IS NOT NULL AND ts IS NOT NULL")  # sequence contract
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type", 1).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    edges = trans.groupBy("src", "dst").agg(F.count("*").alias("w"))
    outw = edges.groupBy("src").agg(
        F.sum("w").cast("double").alias("wout")
    )
    ewn = (
        edges.join(outw, "src")
        .filter(F.col("src") != ABS_TARGET)
        .select("src", "dst", F.col("w").cast("double").alias("w"), "wout")
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = nodes.select(
        "node",
        F.when(F.col("node") == ABS_TARGET, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("p"),
    )
    snapshots = {}
    for k in range(1, max(ABS_STEPS) + 1):
        gathered = (
            ewn.join(
                a.select(F.col("node").alias("dst"), "p"), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.sum(
                    F.round(F.col("w") / F.col("wout") * F.col("p"), 9).cast(
                        "decimal(19,9)"
                    )
                )
                .cast("double")
                .alias("s")
            )
        )
        a = nodes.join(gathered, "node", "left").select(
            "node",
            F.when(F.col("node") == ABS_TARGET, F.lit(1.0))
            .otherwise(F.coalesce(F.col("s"), F.lit(0.0)))
            .alias("p"),
        )
        if k in ABS_STEPS:
            snapshots[k] = a.select(
                "node", F.col("p").alias(f"p_within_{k}")
            )
    out = nodes
    for k in ABS_STEPS:
        out = out.join(snapshots[k], "node")
    return out.select(
        F.col("node").alias("event_type"),
        *[F.round(f"p_within_{k}", 6).alias(f"p_within_{k}") for k in ABS_STEPS],
    ).orderBy("event_type")
