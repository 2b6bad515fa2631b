"""Semantics tests for the training-prep operators (sequence packing,
PII scrub) and the MMR re-ranker — properties the hash-parity check
can't express (invariants, idempotence, diversity vs plain top-k).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF001


def test_pack_sequences_partitions_every_doc_exactly_once(spark):
    """Packing is a partition of the corpus: per-source doc counts and
    token totals are preserved, and pack ids are a dense 0..n sequence
    within each source (contiguous fill leaves no gaps)."""
    from mcp_rag_server_spark.catalog import load_table
    from mcp_rag_server_spark.registry import load_all

    packs = load_all()["ta_pack_sequences"].spark_fn(spark, SF001)
    per_source = (
        packs.groupBy("source")
        .agg(
            F.sum("n_docs").alias("docs"),
            F.max("pack_id").alias("max_pack"),
            F.count("*").alias("n_packs"),
        )
        .collect()
    )
    docs = load_table(spark, SF001, "documents")
    truth = {
        r["source"]: r["cnt"]
        for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert {r["source"]: r["docs"] for r in per_source} == truth
    for r in per_source:
        assert r["n_packs"] == r["max_pack"] + 1, f"gap in {r['source']}"


def test_pack_sequences_respects_start_boundary(spark):
    """A document's pack is the budget window its first token lands in:
    every pack's first doc starts at cum < (pack_id+1)*budget, so no pack
    is entered 'late' and only the doc straddling a boundary overshoots."""
    from mcp_rag_server_spark.operators.training_prep import PACK_BUDGET
    from mcp_rag_server_spark.registry import load_all

    packs = load_all()["ta_pack_sequences"].spark_fn(spark, SF001).collect()
    by_source: dict[str, list] = {}
    for r in sorted(packs, key=lambda r: (r["source"], r["pack_id"])):
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        cum = 0
        for r in rows:
            assert r["pack_id"] * PACK_BUDGET <= cum < (r["pack_id"] + 1) * PACK_BUDGET
            cum += r["pack_tokens"]


def test_pii_scrub_is_idempotent_and_complete(spark):
    """Scrubbing removes every match: re-running detection on scrubbed
    text finds zero emails/phones, and every doc_id%7 / doc_id%11 row is
    flagged (the injection itself is detected with recall 1.0)."""
    from mcp_rag_server_spark.catalog import load_table
    from mcp_rag_server_spark.operators.training_prep import EMAIL_RE, PHONE_RE
    from mcp_rag_server_spark.registry import load_all

    flagged = load_all()["ta_pii_scrub"].spark_fn(spark, SF001)
    n_docs = load_table(spark, SF001, "documents").count()
    expect = {i for i in range(n_docs) if i % 7 == 0 or i % 11 == 0}
    got = {r["doc_id"] for r in flagged.select("doc_id").collect()}
    assert got == expect

    # Rebuild the augmented text, scrub it, detect again: must be clean.
    docs = load_table(spark, SF001, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    residue = (
        docs.select(
            (
                F.regexp_count(scrubbed, F.lit(EMAIL_RE))
                + F.regexp_count(scrubbed, F.lit(PHONE_RE))
            ).alias("n")
        )
        .agg(F.sum("n").alias("total"))
        .collect()[0]["total"]
    )
    assert residue == 0


def test_mmr_diversifies_relative_to_plain_topk(spark):
    """MMR keeps the most-relevant item at rank 1 but swaps at least one
    of the remaining plain-top-k picks for a more diverse candidate, and
    every mmr score is <= its relevance (the diversity penalty only
    subtracts)."""
    from mcp_rag_server_spark.registry import load_all

    reg = load_all()
    mmr = reg["rag_mmr_topk"].spark_fn(spark, SF001).collect()
    topk = reg["rag_topk"].spark_fn(spark, SF001).collect()
    assert [r["rank"] for r in mmr] == [1, 2, 3, 4, 5]
    # rank 1 = the most relevant candidate; rag_topk's rank 1 is the
    # query vector itself (self-match, score 1.0), which MMR excludes.
    assert mmr[0]["vec_id"] == topk[1]["vec_id"]
    assert mmr[0]["mmr"] == mmr[0]["rel"]
    assert {r["vec_id"] for r in mmr} != {r["vec_id"] for r in topk}
    for r in mmr:
        assert r["mmr"] <= r["rel"] + 1e-12


def test_mmr_candidate_stage_is_heap_topk(spark):
    """The candidate pool is produced by TakeOrderedAndProject (the
    shuffle-free per-partition heap top-k) and the re-rank runs as a
    cogrouped pandas stage — no corpus-wide sort or collect."""
    from mcp_rag_server_spark.registry import load_all

    df = load_all()["rag_mmr_topk"].spark_fn(spark, SF001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "FlatMapCoGroupsInPandas" in plan


def test_mmr_batch_matches_per_query_runs(spark):
    """mmr_topk_batch over three query vectors in ONE job (shared corpus
    scan, per-qid window) must reproduce each query's standalone greedy
    selection exactly — the batch path is the 100 TB shape, the single
    path is the latency shape, and they may never disagree."""
    from pyspark.sql import functions as F

    from mcp_rag_server_spark.catalog import load_table
    from mcp_rag_server_spark.operators.rag import mmr_topk_batch

    emb = load_table(spark, SF001, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("vec_id").alias("q_vec_id"),
    )
    batch = sorted(
        tuple(r)
        for r in mmr_topk_batch(emb, queries).collect()
    )
    single = []
    for qid in (0, 1, 2):
        one = queries.filter(F.col("qid") == qid)
        single += [tuple(r) for r in mmr_topk_batch(emb, one).collect()]
    assert batch == sorted(single)
    assert len(batch) == 15  # 3 queries x k=5


def test_mmr_registry_query_equals_batch_path(spark):
    """The registry's single-query heap-top-k candidate stage and the
    batch window-rank stage select identical pools, so the final
    (rank, vec_id, rel, mmr) rows agree."""
    from pyspark.sql import functions as F

    from mcp_rag_server_spark.catalog import load_table
    from mcp_rag_server_spark.operators.rag import mmr_topk_batch
    from mcp_rag_server_spark.registry import load_all

    emb = load_table(spark, SF001, "embeddings")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("vec_id").alias("q_vec_id"),
    )
    via_batch = sorted(
        (r["rank"], r["vec_id"], r["rel"], r["mmr"])
        for r in mmr_topk_batch(emb, queries).collect()
    )
    via_registry = sorted(
        (r["rank"], r["vec_id"], r["rel"], r["mmr"])
        for r in load_all()["rag_mmr_topk"].spark_fn(spark, SF001).collect()
    )
    assert via_batch == via_registry


def test_pack_docs_property_parity_with_python_reference(spark):
    """Property-based parity: for arbitrary per-source token sequences
    and budgets, pack_docs' window arithmetic equals the sequential
    greedy-fill reference (cumsum in doc order, pack = window the doc
    starts in)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from mcp_rag_server_spark.operators.training_prep import pack_docs

    cases = []

    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        sources=st.lists(
            st.lists(st.integers(min_value=1, max_value=900), min_size=1,
                     max_size=30),
            min_size=1,
            max_size=3,
        ),
        budget=st.integers(min_value=1, max_value=1000),
    )
    def collect(sources, budget):
        cases.append((sources, budget))

    collect()
    # One Spark job per distinct budget would still be dozens of jobs;
    # instead scale every case onto ONE budget by keying the source name
    # with (case index, budget) and computing expected ids per case.
    rows, expected = [], {}
    for ci, (sources, budget) in enumerate(cases):
        for si, toks in enumerate(sources):
            src = f"c{ci}b{budget}s{si}"
            cum = 0
            for di, n in enumerate(toks):
                rows.append((src, di, n, budget))
                expected[(src, di)] = cum // budget
                cum += n
    df = spark.createDataFrame(
        rows, "source string, doc_id long, n_tokens long, budget long"
    )
    # pack_docs takes a scalar budget, so run one small job per distinct
    # generated budget, each over only that budget's rows.
    import pyspark.sql.functions as F

    got = {}
    for b in sorted({r[3] for r in rows}):
        part = pack_docs(
            df.filter(F.col("budget") == b).drop("budget"), budget=b
        )
        for r in part.collect():
            got[(r["source"], r["doc_id"])] = r["pack_id"]
    assert got == expected


def test_mmr_demotes_near_duplicate_of_selected(spark):
    """The core MMR behavior on redundant pools: given a candidate that
    is almost identical to the best pick, plain relevance ranks it
    second, but MMR pushes it below a less relevant-but-diverse
    candidate."""
    import math

    from pyspark.sql import functions as F

    from mcp_rag_server_spark.operators.rag import mmr_topk_batch

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    q = unit([1.0, 0.0, 0.0, 0.0])
    rows = [
        (1, unit([0.95, 0.3, 0.0, 0.0])),    # best match
        (2, unit([0.949, 0.3, 0.01, 0.0])),  # near-duplicate of 1
        (3, unit([0.95, -0.3, 0.0, 0.0])),   # equally relevant, diverse
        (4, unit([0.95, 0.0, 0.3, 0.0])),    # equally relevant, diverse
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [float(x) for x in q])], "qid long, qv array<float>"
    )
    got = (
        mmr_topk_batch(emb, queries, pool=4, k=3)
        .orderBy("rank")
        .collect()
    )
    picked = [r["vec_id"] for r in got]
    assert picked[0] == 1
    # vec 2 has the second-highest relevance but is redundant with vec 1;
    # MMR must pick a diverse candidate at rank 2 instead.
    assert picked[1] in (3, 4)
    assert picked[2] in (3, 4)
    assert 2 not in picked
