"""Scale-pattern tests: co-located bucketed joins and salted skew joins —
the two explicit levers the README's scale notes promise beyond what
Catalyst/AQE do automatically."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mcp_rag_server_spark.functions.skew import salted_join
from mcp_rag_server_spark.plans.inspect import count_exchanges, plan_string

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, tmp_path, no_broadcast):
    """Both sides bucketed+sorted on the join key → SortMergeJoin with
    ZERO exchanges: the 100 TB recipe for repeated fact-fact joins
    (bucket pruning also applies). Plain parquet (non-bucketed) joins
    of the same data shuffle both sides."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    for name, df, key in (
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", lineitem, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert count_exchanges(joined) == 0, plan_string(joined)
    assert "SortMergeJoin" in plan_string(joined)
    # Same join on the raw (unbucketed) parquet shuffles both sides.
    raw = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    assert count_exchanges(raw) == 2
    # And the result is identical.
    assert joined.count() == raw.count()


def test_salted_join_matches_plain_join(spark, no_broadcast):
    """A 95%-skewed key: salted result == plain result, and the salted
    shuffle key has n_salts x the cardinality on the hot key."""
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = big.join(small, "k").select("k", "payload", "dim_val")
    salted = salted_join(big, small, "k").select("k", "payload", "dim_val")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_outer(spark, no_broadcast):
    big = spark.range(0, 100).select((F.col("id") % 5).alias("k"), "id")
    small = spark.range(0, 2).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    plain = big.join(small, "k", "left").select("k", "id", "v")
    salted = salted_join(big, small, "k", how="left").select("k", "id", "v")
    assert sorted(
        map(tuple, salted.collect()), key=lambda t: tuple((x is None, x) for x in t)
    ) == sorted(
        map(tuple, plain.collect()), key=lambda t: tuple((x is None, x) for x in t)
    )


def test_salted_join_query_plan_fans_out(spark, no_broadcast):
    """The registry query's shuffle key must be (k, _salt) — the salt
    fan-out is visible as _salt inside the join-side hashpartitioning
    exchanges (with broadcast disabled, as at true scale where the
    exploded dim side still shuffles)."""
    from mcp_rag_server_spark.registry import load_all

    df = load_all()["ev_salted_hot_key_join"].spark_fn(spark, SF)
    plan = plan_string(df)
    assert "_salt" in plan
    import re

    part_keys = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("_salt" in keys and "k" in keys for keys in part_keys), part_keys


def test_star_contraction_chain_converges_logarithmically(spark):
    """A 64-node chain is the adversarial case for min-label propagation
    (needs 63 rounds); large-star/small-star must collapse it to one
    component in <= log2(n)+2 rounds."""
    import math

    from mcp_rag_server_spark.operators.dedup import (
        star_contraction_components,
    )

    n = 64
    chain = spark.range(1, n).select(
        F.col("id").alias("src"), (F.col("id") - 1).alias("dst")
    )
    labels, rounds = star_contraction_components(chain)
    rows = labels.collect()
    assert len(rows) == n
    assert all(r.component == 0 for r in rows)
    assert rounds <= int(math.log2(n)) + 2, rounds


def test_star_contraction_single_terminal_exceptall(spark, monkeypatch):
    """The fixpoint probe is one count() per round; the exceptAll
    symmetric-difference shuffle may run ONLY on the terminal round where
    counts match (the r2 version paid two exceptAll jobs every round)."""
    from mcp_rag_server_spark.operators.dedup import (
        star_contraction_components,
    )

    chain = spark.range(1, 64).select(
        F.col("id").alias("src"), (F.col("id") - 1).alias("dst")
    )
    # Patch the instance's concrete class: pyspark 4 routes instances
    # through the classic/connect subclass, not pyspark.sql.DataFrame.
    cls = type(chain)
    calls = {"n": 0}
    orig = cls.exceptAll

    def counting(self, other):
        calls["n"] += 1
        return orig(self, other)

    monkeypatch.setattr(cls, "exceptAll", counting)
    labels, rounds = star_contraction_components(chain)
    assert labels.count() == 64
    assert rounds >= 2
    assert calls["n"] == 1, calls["n"]


def test_star_contraction_raises_when_round_bound_hit(spark):
    from mcp_rag_server_spark.operators.dedup import (
        star_contraction_components,
    )

    chain = spark.range(1, 16).select(
        F.col("id").alias("src"), (F.col("id") - 1).alias("dst")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        star_contraction_components(chain, max_rounds=1)


def test_mmr_pairs_rejects_unbounded_pool(spark):
    """The per-query O(pool²) self-join must fail loudly if a caller
    claims a pool beyond MMR_POOL_MAX instead of silently launching a
    quadratic job (the contract rag_mmr_topk's LIMIT stage upholds)."""
    from mcp_rag_server_spark.operators.rag import MMR_POOL_MAX, mmr_pairs

    cand = spark.range(3).select(
        F.lit(0).alias("qid"),
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0)).alias("embedding"),
        F.lit(0.5).alias("rel"),
    )
    with pytest.raises(ValueError, match="pool_bound"):
        mmr_pairs(cand, pool_bound=MMR_POOL_MAX + 1)
    mmr_pairs(cand, pool_bound=MMR_POOL_MAX)  # at the cap: fine


def test_band_audit_truth_is_sampled_above_guard(spark):
    """dd_lsh_band_audit's exact-truth all-pairs join must run on the
    ABSOLUTE lowest-md5 AUDIT_SAMPLE_ROWS sample whenever the corpus
    exceeds AUDIT_FULL_MAX — the cap is code, not prose: the md5 sort
    key and the global limit both have to appear in the plan, and the
    physical plan must realize the limit as TakeOrderedAndProject (no
    full sort shuffle)."""
    from mcp_rag_server_spark.operators.dedup import (
        AUDIT_FULL_MAX,
        AUDIT_SAMPLE_ROWS,
        dd_lsh_band_audit,
    )

    sf = "/root/testdata/sf0.01"  # 500 docs > AUDIT_FULL_MAX
    n = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert n > AUDIT_FULL_MAX
    df = dd_lsh_band_audit(spark, sf)
    plan = plan_string(df, "extended")
    squashed = plan.replace(" ", "").lower()
    assert "__audit_md5" in plan  # the md5 sort key
    assert f"limit{AUDIT_SAMPLE_ROWS}" in squashed.replace("=", "")
    physical = plan_string(df, "formatted")
    assert "TakeOrderedAndProject" in physical


def test_band_audit_full_corpus_branch_parity(spark, tmp_path):
    """The audit's BELOW-guard branch (corpus <= AUDIT_FULL_MAX: no
    sampling, truth over the full corpus) must also match the oracle.
    Every driver fixture has 500 docs — above the guard — so this
    branch is reachable only here: both engines run over a 200-doc
    subset, exercising the unsampled Spark path and the oracle's first
    UNION ALL arm."""
    import duckdb

    from mcp_rag_server_spark.operators.dedup import (
        AUDIT_FULL_MAX,
        dd_lsh_band_audit,
    )
    from mcp_rag_server_spark.registry import load_all
    from tests.test_oracle_parity import canon_rows

    small = str(tmp_path / "small_sf")
    (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{small}/documents.parquet")
    )
    n = spark.read.parquet(f"{small}/documents.parquet").count()
    assert 0 < n <= AUDIT_FULL_MAX
    spdf = dd_lsh_band_audit(spark, small).toPandas()
    assert len(spdf) == 4  # all four bandings present

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{small}/documents.parquet/*.parquet')"
    )
    ddf = con.execute(load_all()["dd_lsh_band_audit"].oracle).fetchdf()
    con.close()
    srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    drows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert canon_rows(list(spdf.columns), srows) == canon_rows(
        list(ddf.columns), drows
    )


def test_gdpr_delete_drops_fully_emptied_bucket(spark):
    """Dynamic partition overwrite replaces only partitions PRESENT in
    the written frame — erasing every row of a bucket contributes no
    partition, so without the explicit directory delete the old files
    silently survive. sf0.001 has exactly one user per bucket, so the
    erased user's whole bucket must vanish from the result (this
    fixture caught the bug: a cross-SF oracle sweep mismatched only
    here while sf0.01, where the bucket keeps other users, passed)."""
    import duckdb as _duckdb

    from test_oracle_parity import canon_rows

    from mcp_rag_server_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    spdf = (
        load_all()["ingest_gdpr_delete"].spark_fn(spark, sf).toPandas()
    )
    # bucket 3 (users 3/19/35 all ≡ 3 mod 16) must be gone entirely
    assert 3 not in set(spdf["user_bucket"])
    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    ddf = con.execute(load_all()["ingest_gdpr_delete"].oracle).fetchdf()
    con.close()
    srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    drows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert canon_rows(list(spdf.columns), srows) == canon_rows(
        list(ddf.columns), drows
    )


def test_scan_parallelism_scales_with_file_count(spark, tmp_path):
    """The bench fixtures are single-row-group files, so headline scans
    (tpch_q1) run as ONE task — a fixture artifact, not an engine limit
    (BASELINE.md caveat). This pins the 100x claim the bench can't
    show: the same lineitem data written as N files yields a scan whose
    partition count scales with N (Spark's file-split packing charges
    each file openCostInBytes, so small files land in distinct splits),
    while the single-file original stays a single task. At 100 TB the
    writer's job is therefore layout (file count x row-group size), and
    the reader parallelizes for free."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    single = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert single.rdd.getNumPartitions() == 1

    multi_dir = str(tmp_path / "lineitem_multifile")
    li.repartition(8).write.parquet(multi_dir)
    multi = spark.read.parquet(multi_dir)
    assert multi.rdd.getNumPartitions() >= 8
    # same rows either way — layout must never change content
    assert multi.count() == li.count()


def test_connected_components_match_union_find(spark):
    """dd_connected_components' star-contraction labels must equal an
    independent union-find closure over the same edge list (min node id
    as the component label). Guards the contraction algebra itself —
    the DuckDB recursive-CTE oracle is an independent engine but the
    same reachability formulation; union-find is a different algorithm
    entirely (same reasoning as the OLS-vs-numpy check)."""
    from mcp_rag_server_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in load_all()["dd_jaccard_same_source"]
        .spark_fn(spark, sf)
        .collect()
    ]
    got = {
        r["doc_id"]: r["component"]
        for r in load_all()["dd_connected_components"]
        .spark_fn(spark, sf)
        .collect()
    }

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for node in parent:
        root = find(node)
        want[node] = min(want.get(node, root), root)
    # canonical label = min id in the component
    comp_min: dict = {}
    for node in parent:
        r = find(node)
        comp_min[r] = min(comp_min.get(r, node), node)
    want = {node: comp_min[find(node)] for node in parent}

    assert got == want, (got, want)


def test_pagerank_matches_python_power_iteration(spark):
    """ev_pagerank_types' distributed scatter/gather must agree with a
    direct in-memory power iteration over the same transition graph —
    same damping, iteration count, and per-term round-9 contributions,
    but computed by a plain Python loop instead of joins/aggregations
    (independent-algorithm guard, like the OLS/union-find checks)."""
    from collections import defaultdict

    from mcp_rag_server_spark.operators.graphs import PR_DAMPING, PR_ITERS
    from mcp_rag_server_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id", "event_id", "event_type", "ts")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    edges: dict = defaultdict(int)
    for _, g in ev.groupby("user_id"):
        types = list(g["event_type"])
        for a, b in zip(types, types[1:]):
            edges[(a, b)] += 1
    outw: dict = defaultdict(int)
    for (a, _b), w in edges.items():
        outw[a] += w
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(PR_ITERS):
        s: dict = defaultdict(float)
        for (a, b), w in sorted(edges.items()):
            s[b] += round(rank[a] * w / outw[a], 9)
        rank = {
            v: (1 - PR_DAMPING) / n + PR_DAMPING * s.get(v, 0.0)
            for v in nodes
        }

    got = {
        r["event_type"]: r["pagerank"]
        for r in load_all()["ev_pagerank_types"]
        .spark_fn(spark, sf)
        .collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - round(rank[v], 6)) < 2e-6, (v, got[v], rank[v])


def test_kmeans_refine_matches_numpy_lloyd(spark):
    """sim_kmeans_refine's distributed Lloyd iterations must agree with
    a direct numpy implementation over the same seed centroids,
    distance rounding, and (distance, cluster) tie-break — membership
    counts exactly, inertia within rounding tolerance (independent-
    algorithm guard, like the OLS/union-find/PageRank checks)."""
    import numpy as np

    from mcp_rag_server_spark.operators.clustering import KM_ITERS
    from mcp_rag_server_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").toPandas()
    X = np.stack(
        [np.round(np.asarray(v, dtype=float), 7) for v in emb["embedding"]]
    )
    labels = sorted(emb["label"].unique())
    cent = {
        c: X[(emb["label"] == c).to_numpy()].mean(axis=0) for c in labels
    }
    # KM_ITERS assignments with KM_ITERS-1 centroid updates between
    # them; the reported inertia is the dd of the FINAL assignment
    # (the operator's a2 stage scores and assigns with c1 in one pass).
    assign = None
    dd = None
    for it in range(KM_ITERS):
        dd = np.stack(
            [
                np.round(((X - cent[c]) ** 2).sum(axis=1), 6)
                for c in labels
            ],
            axis=1,
        )
        assign = np.lexsort((np.arange(len(labels))[None, :].repeat(
            len(X), 0), dd), axis=1)[:, 0]  # argmin by (dd, cluster order)
        if it < KM_ITERS - 1:
            cent = {
                c: X[assign == i].mean(axis=0)
                for i, c in enumerate(labels)
                if (assign == i).any()
            }
    want_n = {labels[i]: int((assign == i).sum()) for i in range(len(labels))}
    want_inertia = {
        labels[i]: float(np.round(dd[assign == i, i].sum(), 4))
        for i in range(len(labels))
    }

    got = {
        r["cluster"]: (r["n_assigned"], r["inertia"])
        for r in load_all()["sim_kmeans_refine"].spark_fn(spark, sf).collect()
    }
    assert {c: v[0] for c, v in got.items()} == want_n
    for c, (_, inertia) in got.items():
        assert abs(inertia - want_inertia[c]) < 1e-2, (
            c, inertia, want_inertia[c],
        )
