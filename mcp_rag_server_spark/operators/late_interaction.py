"""Late-interaction and binary-quantization retrieval scoring.

Two modern retrieval scorers the single-vector cosine family
(similarity.py) and the codebook family (vector_audit.py) don't cover:

sim_maxsim_topk — ColBERT-style MaxSim (Khattab & Zaharia, SIGIR'20):
score(q, d) = Σ_i max_j sim(q_i, d_j) over per-token vectors. The
fixture embedding is one 64-d vector, so "tokens" are modeled as its 8
contiguous 8-d sub-blocks — the SHAPE of the computation (a sum over
query tokens of a max over doc tokens, nested JVM folds, heap top-k)
is exactly the late-interaction scorer, and the oracle replays it
block for block. At 100 TB the doc sub-vectors are the stored
representation and the same expression scores each candidate; the
candidate set comes from an ANN prefilter (sim_ivf_topk /
sim_hyperplane_lsh register that stage) — MaxSim is the re-rank leg.

sim_binary_hamming_topk — 1-bit quantization: sign-binarize every
dimension into a packed code and score by popcount of the XOR. This is
the 64× compression point of the quantization ladder (float32 → SQ8 →
PQ → 1-bit) and the scan is integer-only: two BIGINT XORs + popcounts
per candidate, no float math at all. Codes pack 32 bits per BIGINT
half (lo/hi) so the sign bit never goes near two's-complement edge
cases in either engine.

Determinism: MaxSim's per-block cosines are fixed-operand-order IEEE
double math (registry rule 3) with the rounded-4 score as the sort
key (rule 4); Hamming distances are exact integers. Both top-k orders
carry a vec_id tie-break (rule 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.functions.vector import (
    cosine_score,
    duckdb_cosine,
    valid_embedding,
    valid_embedding_sql,
)
from mcp_rag_server_spark.registry import register

MAXSIM_BLOCKS = 8
MAXSIM_DIM = 8
MAXSIM_QUERY_ID = 0
MAXSIM_TOP_K = 5


def _ms_spark_subs(col: str) -> str:
    """array of 8 sub-vectors (8 doubles each) from a 64-float array."""
    return (
        f"transform(sequence(0, {MAXSIM_BLOCKS - 1}), ms_b -> "
        f"transform(slice({col}, ms_b * {MAXSIM_DIM} + 1, {MAXSIM_DIM}), "
        f"ms_x -> CAST(ms_x AS DOUBLE)))"
    )


_MS_SPARK_COS = (
    "(aggregate(zip_with(ms_q, ms_d, (ms_x, ms_y) -> ms_x * ms_y), "
    "CAST(0 AS DOUBLE), (ms_a, ms_v) -> ms_a + ms_v) / "
    "(sqrt(aggregate(transform(ms_q, ms_x -> ms_x * ms_x), "
    "CAST(0 AS DOUBLE), (ms_a, ms_v) -> ms_a + ms_v)) * "
    "sqrt(aggregate(transform(ms_d, ms_x -> ms_x * ms_x), "
    "CAST(0 AS DOUBLE), (ms_a, ms_v) -> ms_a + ms_v)) + 1e-10))"
)

_MS_SPARK_SCORE = (
    "round(aggregate(transform(qsubs, ms_q -> "
    "array_max(transform(dsubs, ms_d -> " + _MS_SPARK_COS + "))), "
    "CAST(0 AS DOUBLE), (ms_sa, ms_sv) -> ms_sa + ms_sv), 4)"
)


def _ms_duck_cos(qoff: int, doff: int) -> str:
    """8-dim cosine between the query block at qoff and the doc block
    at doff (1-based list offsets), same fold order as the Spark HOFs."""
    rng = f"range(0, {MAXSIM_DIM})"
    dot = (
        f"list_sum(list_transform({rng}, ms_i -> "
        f"CAST(q.embedding[{qoff} + ms_i] AS DOUBLE)"
        f" * CAST(d.embedding[{doff} + ms_i] AS DOUBLE)))"
    )
    nq = (
        f"sqrt(list_sum(list_transform({rng}, ms_i -> "
        f"CAST(q.embedding[{qoff} + ms_i] AS DOUBLE)"
        f" * CAST(q.embedding[{qoff} + ms_i] AS DOUBLE))))"
    )
    nd = (
        f"sqrt(list_sum(list_transform({rng}, ms_i -> "
        f"CAST(d.embedding[{doff} + ms_i] AS DOUBLE)"
        f" * CAST(d.embedding[{doff} + ms_i] AS DOUBLE))))"
    )
    return f"({dot} / ({nq} * {nd} + 1e-10))"


def _ms_oracle() -> str:
    terms = []
    for qb in range(MAXSIM_BLOCKS):
        cands = ", ".join(
            _ms_duck_cos(qb * MAXSIM_DIM + 1, db * MAXSIM_DIM + 1)
            for db in range(MAXSIM_BLOCKS)
        )
        terms.append(f"greatest({cands})")
    score = "round(" + " + ".join(terms) + ", 4)"
    return f"""
WITH q AS (SELECT embedding FROM embeddings
           WHERE vec_id = {MAXSIM_QUERY_ID}),
scored AS (
  SELECT d.vec_id, d.label, {score} AS maxsim
  FROM embeddings d CROSS JOIN q
  WHERE d.vec_id <> {MAXSIM_QUERY_ID}
)
SELECT vec_id, label, maxsim
FROM scored
ORDER BY maxsim DESC, vec_id
LIMIT {MAXSIM_TOP_K}
"""


@register(
    "sim_maxsim_topk",
    oracle=_ms_oracle(),
    description="ColBERT-style late-interaction MaxSim top-k: per-token"
    " score = sum over 8 query sub-blocks of the max cosine against 8"
    " doc sub-blocks, nested JVM folds + heap top-k, rounded-4 score is"
    " the sort key (Khattab & Zaharia SIGIR'20)",
    tags=("similarity", "vector", "late-interaction"),
)
def sim_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late interaction decomposed onto Spark: doc token-vectors are a
    per-row nested array (the stored representation at scale), the
    query's token-vectors ride a 1-row broadcast, and score is one
    codegen'd nested fold — sum over query blocks of array_max over
    doc blocks — followed by TakeOrderedAndProject (heap top-k, no
    global sort). The whole scorer is JVM-side; nothing leaves the
    executor but k rows. In production the corpus side is ANN-pruned
    first; this registers the exact re-rank leg the pruned candidates
    flow into."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == MAXSIM_QUERY_ID).select(
        F.expr(_ms_spark_subs("embedding")).alias("qsubs")
    )
    d = emb.filter(F.col("vec_id") != MAXSIM_QUERY_ID).select(
        "vec_id",
        "label",
        F.expr(_ms_spark_subs("embedding")).alias("dsubs"),
    )
    return (
        d.crossJoin(F.broadcast(q))
        .select("vec_id", "label", F.expr(_MS_SPARK_SCORE).alias("maxsim"))
        .orderBy(F.desc("maxsim"), F.asc("vec_id"))
        .limit(MAXSIM_TOP_K)
    )


HAM_QUERY_ID = 0
HAM_TOP_K = 5


def _pack_spark(col: str, lo_bit: int) -> str:
    """Pack 32 sign bits (dims lo_bit..lo_bit+31) into a BIGINT."""
    return (
        f"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (hb_acc, hb_i) -> "
        f"hb_acc + IF(element_at({col}, hb_i + {lo_bit} + 1) > 0, "
        f"shiftleft(CAST(1 AS BIGINT), hb_i), CAST(0 AS BIGINT)))"
    )


def _pack_duck(col: str, lo_bit: int) -> str:
    return (
        f"list_sum(list_transform(range(0, 32), hb_i -> "
        f"CASE WHEN {col}[hb_i + {lo_bit} + 1] > 0 "
        f"THEN (CAST(1 AS BIGINT) << hb_i) ELSE CAST(0 AS BIGINT) END))"
    )


_HAM_ORACLE = f"""
WITH codes AS (
  SELECT vec_id, label,
         CAST({_pack_duck('embedding', 0)} AS BIGINT) AS lo,
         CAST({_pack_duck('embedding', 32)} AS BIGINT) AS hi
  FROM embeddings
  WHERE {valid_embedding_sql('duckdb')}
),
q AS (SELECT lo AS q_lo, hi AS q_hi FROM codes WHERE vec_id = {HAM_QUERY_ID})
SELECT c.vec_id, c.label,
       CAST(bit_count(xor(c.lo, q.q_lo))
            + bit_count(xor(c.hi, q.q_hi)) AS INT) AS hamming
FROM codes c CROSS JOIN q
WHERE c.vec_id <> {HAM_QUERY_ID}
ORDER BY hamming, c.vec_id
LIMIT {HAM_TOP_K}
"""


@register(
    "sim_binary_hamming_topk",
    oracle=_HAM_ORACLE,
    description="1-bit binary-quantization retrieval: sign-binarized"
    " 64-bit codes packed as two BIGINT halves, scored by XOR popcount"
    " — the 64x-compression end of the quantization ladder, an"
    " integer-only scan with exact Hamming distances and heap top-k",
    tags=("similarity", "vector", "quantization", "hamming"),
)
def sim_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantization ladder's last rung (float32 → SQ8 → PQ → 1-bit,
    registered in that order across similarity.py/vector_audit.py):
    each vector becomes sign bits packed 32-per-BIGINT, distance is
    bit_count(xor) per half — two integer ops per candidate, no float
    math in the scan, codes 64× smaller than the float vectors so the
    whole index rides memory/broadcast tiers that floats never could.
    Packing is a one-time narrow projection (at scale: computed at
    write time and stored as two BIGINT columns; parquet min/max even
    gives crude pruning on the high half). Exact integer distances +
    vec_id tie-break make the top-k hash-stable."""
    # valid_embedding gate: 64 positional reads (ANSI-throw on short
    # arrays in Spark, silent NULL codes in DuckDB) — invalid vectors
    # dropped by contract on BOTH engines (sim_embedding_validate)
    emb = load_table(spark, sf_dir, "embeddings").filter(valid_embedding())
    codes = emb.select(
        "vec_id",
        "label",
        F.expr(_pack_spark("embedding", 0)).alias("lo"),
        F.expr(_pack_spark("embedding", 32)).alias("hi"),
    )
    q = codes.filter(F.col("vec_id") == HAM_QUERY_ID).select(
        F.col("lo").alias("q_lo"), F.col("hi").alias("q_hi")
    )
    return (
        codes.filter(F.col("vec_id") != HAM_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            (
                F.expr("bit_count(lo ^ q_lo)") + F.expr("bit_count(hi ^ q_hi)")
            )
            .cast("int")
            .alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(HAM_TOP_K)
    )


MIPS_QUERY_ID = 0
MIPS_TOP_K = 5


def _mips_oracle() -> str:
    dot = (
        "round(list_sum(list_transform(range(1, 65), mip_i -> "
        "CAST(d.embedding[mip_i] AS DOUBLE)"
        " * CAST(q.embedding[mip_i] AS DOUBLE))), 4)"
    )
    nsq = (
        "list_sum(list_transform(range(1, 65), mip_i -> "
        "CAST({v}.embedding[mip_i] AS DOUBLE)"
        " * CAST({v}.embedding[mip_i] AS DOUBLE)))"
    )
    return f"""
WITH q AS (SELECT embedding FROM embeddings
           WHERE vec_id = {MIPS_QUERY_ID}),
scored AS (
  SELECT d.vec_id, d.label,
         {dot} AS dot,
         round({nsq.format(v="d")}, 6) AS dn2
  FROM embeddings d CROSS JOIN q
  WHERE d.vec_id <> {MIPS_QUERY_ID}
),
aug AS (
  SELECT s.vec_id, s.label, s.dot,
         round(2 * s.dot - s.dn2, 4) AS neg_aug_l2
  FROM scored s
)
SELECT vec_id, label, dot, neg_aug_l2
FROM aug
ORDER BY neg_aug_l2 DESC, vec_id
LIMIT {MIPS_TOP_K}
"""


@register(
    "sim_mips_augmented",
    oracle=_mips_oracle(),
    description="maximum-inner-product search via the norm-augmentation"
    " reduction (Shrivastava & Li, NeurIPS'14 ALSH): augmented squared-"
    "L2 ordering -||x||² + 2q·x reproduces the MIPS ranking exactly —"
    " both the raw dot and the reduced score ride the hash, heap top-k",
    tags=("similarity", "vector", "mips"),
)
def sim_mips_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIPS doesn't fit metric ANN indexes directly (inner product
    violates the triangle inequality); the standard fix augments each
    vector with sqrt(M² − ||x||²) so query-to-augmented-L2 order
    equals inner-product order: ||x̂ − q̂||² = M² + ||q||² − 2q·x + ||x||²
    − ||x||² terms collapse so minimizing augmented L2 maximizes
    2q·x − ||x||² + const. The registered score is that monotone core
    (the per-corpus constant M² drops out of the ordering), and the
    raw dot column riding the hash proves the reduction reproduces the
    MIPS order (a wrong augmentation reorders rows and flips the
    hash). Shapes: one broadcast query, one codegen
    fold per row for dot and squared norm, heap top-k; at scale the
    augmented vectors feed the existing IVF/LSH index path
    (vector_lsh.py) unchanged — that is the reduction's whole point."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == MIPS_QUERY_ID).select(
        F.col("embedding").alias("qv")
    )
    dot = F.round(
        F.expr(
            "aggregate(zip_with(embedding, qv, (mip_x, mip_y) -> "
            "CAST(mip_x AS DOUBLE) * CAST(mip_y AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (mip_a, mip_v) -> mip_a + mip_v)"
        ),
        4,
    )
    nsq = F.round(
        F.expr(
            "aggregate(transform(embedding, mip_x -> "
            "CAST(mip_x AS DOUBLE) * CAST(mip_x AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (mip_a, mip_v) -> mip_a + mip_v)"
        ),
        6,
    )
    scored = (
        emb.filter(F.col("vec_id") != MIPS_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            dot.alias("dot"),
            nsq.alias("dn2"),
        )
    )
    return (
        scored.select(
            "vec_id",
            "label",
            "dot",
            F.round(F.lit(2) * F.col("dot") - F.col("dn2"), 4).alias(
                "neg_aug_l2"
            ),
        )
        .orderBy(F.desc("neg_aug_l2"), F.asc("vec_id"))
        .limit(MIPS_TOP_K)
    )


HN_ANCHORS = 5


def _hn_oracle() -> str:
    cos = (
        "round(list_sum(list_transform(range(1, 65), hn_i -> "
        "CAST(d.embedding[hn_i] AS DOUBLE)"
        " * CAST(a.embedding[hn_i] AS DOUBLE))) / "
        "(sqrt(list_sum(list_transform(range(1, 65), hn_i -> "
        "CAST(d.embedding[hn_i] AS DOUBLE)"
        " * CAST(d.embedding[hn_i] AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(range(1, 65), hn_i -> "
        "CAST(a.embedding[hn_i] AS DOUBLE)"
        " * CAST(a.embedding[hn_i] AS DOUBLE)))) + 1e-10), 4)"
    )
    return f"""
WITH anchors AS (
  SELECT vec_id AS a_id, label AS a_label, embedding
  FROM embeddings WHERE vec_id < {HN_ANCHORS}
),
scored AS (
  SELECT a.a_id, a.a_label, d.vec_id, d.label, {cos} AS score
  FROM embeddings d CROSS JOIN anchors a
  WHERE d.vec_id <> a.a_id
),
picks AS (
  SELECT a_id, a_label,
         CASE WHEN label = a_label THEN 'positive'
              ELSE 'hard_negative' END AS role,
         vec_id, score,
         row_number() OVER (
           PARTITION BY a_id,
             CASE WHEN label = a_label THEN 'positive'
                  ELSE 'hard_negative' END
           ORDER BY score DESC, vec_id) AS rn
  FROM scored
)
SELECT a_id, a_label, role, vec_id, score
FROM picks WHERE rn = 1
ORDER BY a_id, role
"""


@register(
    "sim_hard_negatives",
    oracle=_hn_oracle(),
    description="contrastive training-pair mining: per anchor, the"
    " highest-cosine SAME-label vector (positive) and the highest-"
    "cosine DIFFERENT-label vector (hard negative) from one scored"
    " scan + one (anchor, role)-keyed rank window — the triplet-mining"
    " step of embedding-model training",
    tags=("similarity", "vector", "training", "mining"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives — the wrong-label vectors CLOSEST to the anchor
    — are what make contrastive training work (random negatives are
    trivially separable and teach nothing); this registers the mining
    pass that produces (anchor, positive, hard-negative) triplets.
    One broadcast of the anchor batch, one codegen cosine per
    (vector, anchor), then a single rank window keyed by (anchor,
    role) picks both roles' argmax in one shuffle — at 100 TB the
    corpus side is ANN-pruned per anchor first (sim_ivf_topk's cell
    route) and the same window runs on candidates. Rounded-4 score
    with vec_id tie-break keeps the picked ids engine-identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < HN_ANCHORS).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("a_emb"),
    )
    cos = F.round(
        F.expr(
            "aggregate(zip_with(embedding, a_emb, (hn_x, hn_y) -> "
            "CAST(hn_x AS DOUBLE) * CAST(hn_y AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (hn_a, hn_v) -> hn_a + hn_v) / "
            "(sqrt(aggregate(transform(embedding, hn_x -> "
            "CAST(hn_x AS DOUBLE) * CAST(hn_x AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (hn_a, hn_v) -> hn_a + hn_v)) * "
            "sqrt(aggregate(transform(a_emb, hn_x -> "
            "CAST(hn_x AS DOUBLE) * CAST(hn_x AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (hn_a, hn_v) -> hn_a + hn_v)) + 1e-10)"
        ),
        4,
    )
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("a_id"))
        .select(
            "a_id",
            "a_label",
            "vec_id",
            "label",
            cos.alias("score"),
        )
    )
    role = F.when(F.col("label") == F.col("a_label"), "positive").otherwise(
        "hard_negative"
    )
    w = Window.partitionBy("a_id", "role").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    return (
        scored.withColumn("role", role)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("a_id", "a_label", "role", "vec_id", "score")
        .orderBy("a_id", "role")
    )


#: Cascade parameters: Hamming prefilter keeps CR_POOL candidates out
#: of the corpus; exact cosine reranks them to CR_K. Query vector 3
#: (any id works; 0 already anchors sim_binary_hamming_topk).
CR_QUERY_ID = 3
CR_POOL = 50
CR_K = 10


def _cascade_oracle() -> str:
    cos = duckdb_cosine("e.embedding", "qv.q_embedding")
    return f"""
WITH emb_v AS (
  -- valid_embedding gate: mirrors the Spark side's filter, so pool,
  -- rerank, and the exact-top audit all run over the same survivors
  SELECT * FROM embeddings WHERE {valid_embedding_sql('duckdb')}
),
codes AS (
  SELECT vec_id, label,
         CAST({_pack_duck('embedding', 0)} AS BIGINT) AS lo,
         CAST({_pack_duck('embedding', 32)} AS BIGINT) AS hi
  FROM emb_v
),
q AS (SELECT lo AS q_lo, hi AS q_hi FROM codes WHERE vec_id = {CR_QUERY_ID}),
pool AS (
  SELECT c.vec_id,
         CAST(bit_count(xor(c.lo, q.q_lo))
              + bit_count(xor(c.hi, q.q_hi)) AS INT) AS hamming
  FROM codes c CROSS JOIN q
  WHERE c.vec_id <> {CR_QUERY_ID}
  ORDER BY hamming, c.vec_id
  LIMIT {CR_POOL}
),
qv AS (SELECT embedding AS q_embedding FROM emb_v
       WHERE vec_id = {CR_QUERY_ID}),
rerank AS (
  SELECT e.vec_id, e.label, p.hamming, round({cos}, 4) AS score
  FROM pool p JOIN emb_v e ON e.vec_id = p.vec_id
  CROSS JOIN qv
),
cascade_top AS (
  SELECT * FROM rerank ORDER BY score DESC, vec_id LIMIT {CR_K}
),
exact_top AS (
  SELECT e.vec_id
  FROM emb_v e CROSS JOIN qv
  WHERE e.vec_id <> {CR_QUERY_ID}
  ORDER BY round({cos}, 4) DESC, e.vec_id
  LIMIT {CR_K}
)
SELECT t.vec_id, t.label, t.hamming, t.score,
       (x.vec_id IS NOT NULL) AS in_exact_topk
FROM cascade_top t LEFT JOIN exact_top x ON x.vec_id = t.vec_id
ORDER BY t.score DESC, t.vec_id
"""


@register(
    "sim_cascade_rerank",
    oracle=_cascade_oracle(),
    description="two-stage cascade retrieval: 64-bit binary-Hamming"
    " prefilter keeps a 50-candidate pool (integer-only scan), exact"
    " float cosine reranks only the pool to top-10 — with the per-row"
    " recall audit against brute-force exact top-10 riding in the"
    " in_exact_topk column",
    tags=("similarity", "vector", "quantization", "topk", "cascade"),
)
def sim_cascade_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production retrieval shape: a cheap wide stage then an
    expensive narrow stage. Stage 1 scans packed sign bits (two
    bit_count(xor) ops per row — the corpus-sized work, and 64× less
    I/O than floats) into a CR_POOL-sized heap
    (TakeOrderedAndProject); stage 2 computes exact cosine for POOL
    rows only — the float math touches 50 vectors, not the corpus.
    At 100 TB stage 1 is the only full scan and reads two BIGINT
    columns; stage 2 is a broadcast-semi-join point lookup. The
    in_exact_topk flag joins the cascade's top-10 against the
    brute-force exact top-10, so the hashed result PINS the cascade's
    recall on this corpus — the audit rides the result instead of
    living in a doc. Ties break on vec_id at both the pool boundary
    and the final cut, keeping the cascade hash-deterministic."""
    # valid_embedding gate — same contract as sim_binary_hamming_topk;
    # every stage (codes, qv, rerank, exact_top) flows from emb
    emb = load_table(spark, sf_dir, "embeddings").filter(valid_embedding())
    codes = emb.select(
        "vec_id",
        F.expr(_pack_spark("embedding", 0)).alias("lo"),
        F.expr(_pack_spark("embedding", 32)).alias("hi"),
    )
    q_code = codes.filter(F.col("vec_id") == CR_QUERY_ID).select(
        F.col("lo").alias("q_lo"), F.col("hi").alias("q_hi")
    )
    pool = (
        codes.filter(F.col("vec_id") != CR_QUERY_ID)
        .crossJoin(F.broadcast(q_code))
        .select(
            "vec_id",
            (
                F.expr("bit_count(lo ^ q_lo)") + F.expr("bit_count(hi ^ q_hi)")
            )
            .cast("int")
            .alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(CR_POOL)
    )
    qv = emb.filter(F.col("vec_id") == CR_QUERY_ID).select(
        F.col("embedding").alias("q_embedding")
    )
    rerank = (
        emb.join(F.broadcast(pool), "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            "hamming",
            cosine_score("embedding", "q_embedding").alias("score"),
        )
    )
    cascade_top = rerank.orderBy(F.desc("score"), F.asc("vec_id")).limit(CR_K)
    exact_top = (
        emb.filter(F.col("vec_id") != CR_QUERY_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", cosine_score("embedding", "q_embedding").alias("xs")
        )
        .orderBy(F.desc("xs"), F.asc("vec_id"))
        .limit(CR_K)
        .select(F.col("vec_id").alias("x_vec_id"))
    )
    return (
        cascade_top.join(
            F.broadcast(exact_top),
            F.col("vec_id") == F.col("x_vec_id"),
            "left",
        )
        .select(
            "vec_id",
            "label",
            "hamming",
            "score",
            F.col("x_vec_id").isNotNull().alias("in_exact_topk"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
    )
