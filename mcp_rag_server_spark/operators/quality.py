"""Corpus-quality and mixture-planning operators (round-4 additions to
the LLM-data-pipeline surface).

Four production shapes a 100 TB training-data pipeline runs between raw
crawl and tokenizer:

- ``ta_gopher_rules``: the per-rule rejection census of a Gopher/C4-style
  filter battery (which rule drops how many docs per source) — the audit
  that precedes any bulk filter deploy.
- ``ta_unigram_logprob``: CCNet-style mean token surprisal under a
  corpus-wide unigram LM — the cheap perplexity proxy used to rank and
  filter documents before an expensive LM-perplexity pass.
- ``ta_mix_temperature``: temperature-scaled source weights
  (w_i ∝ n_i^(1/T), here sqrt = T=2) — the mixture-flattening rule
  multilingual/multi-source training runs use so small sources are not
  drowned out.
- ``ta_shard_assign``: deterministic md5-bucket shard assignment with
  per-shard balance stats — the reproducible "global shuffle" that
  replaces rand() sharding (any engine, any partitioning: same shards).

All four are pure JVM-side expressions (no UDFs): per-row array math in
whole-stage codegen, aggregations as partial-agg shuffles on small keys
(source, shard, token), never on documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.operators.textanalysis import STOPWORDS, _SW_SQL
from mcp_rag_server_spark.registry import register

#: Gopher-style rule thresholds, tuned to be non-vacuous on the fixture
#: word-soup (sf0.01: 169 short, ~6 word-length, 281 diversity, 47
#: no-stopword failures out of 500 — every rule fires, none rejects
#: everything).
RULE_MIN_TOKENS = 40
RULE_MAX_TOKENS = 90
RULE_MIN_MEAN_WORDLEN = 4.0
RULE_MAX_MEAN_WORDLEN = 7.0
RULE_MIN_DISTINCT_RATIO = 0.5

#: Mean word length is derived exactly from (n_chars, n_tokens) because
#: the fixture text is single-space-separated: chars in words =
#: n_chars - (n_tokens - 1).
_MW_SQL = "(CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens)"


@register(
    "ta_gopher_rules",
    oracle=f"""
WITH feat AS (
  SELECT source,
         len(toks) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio,
         len(list_filter(toks, t -> t IN {_SW_SQL})) AS n_stop,
         n_chars
  FROM (SELECT source, n_chars, string_split(text, ' ') AS toks FROM documents)
),
flagged AS (
  SELECT source,
         CASE WHEN n_tokens < {RULE_MIN_TOKENS} THEN 1 ELSE 0 END AS f_short,
         CASE WHEN n_tokens > {RULE_MAX_TOKENS} THEN 1 ELSE 0 END AS f_long,
         CASE WHEN {_MW_SQL} < {RULE_MIN_MEAN_WORDLEN}
                OR {_MW_SQL} > {RULE_MAX_MEAN_WORDLEN} THEN 1 ELSE 0 END
           AS f_wordlen,
         CASE WHEN distinct_ratio < {RULE_MIN_DISTINCT_RATIO} THEN 1 ELSE 0 END
           AS f_diversity,
         CASE WHEN n_stop = 0 THEN 1 ELSE 0 END AS f_nostop
  FROM feat
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(f_short) AS BIGINT) AS n_fail_short,
       CAST(SUM(f_long) AS BIGINT) AS n_fail_long,
       CAST(SUM(f_wordlen) AS BIGINT) AS n_fail_wordlen,
       CAST(SUM(f_diversity) AS BIGINT) AS n_fail_diversity,
       CAST(SUM(f_nostop) AS BIGINT) AS n_fail_nostop,
       CAST(SUM(CASE WHEN f_short + f_long + f_wordlen + f_diversity
                          + f_nostop = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass
FROM flagged
GROUP BY source
ORDER BY source
""",
    description="Gopher-style filter-rule census per source: how many docs"
    " each rule (too short/long, word-length band, lexical diversity,"
    " no-stopword) rejects, and how many pass all — the audit run before"
    " deploying a bulk quality filter",
    tags=("text", "quality", "filter"),
    bench=True,
)
def ta_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule battery in the style of Gopher's document filters (Rae et
    al. 2021, public) and C4's heuristics: length bounds, mean-word-
    length band, lexical diversity floor, must-contain-stopword. The
    census (per-rule counts, not just pass/fail) is what a pipeline
    operator actually reviews before enabling a filter at 100 TB — a
    rule that rejects 60% of one source is a bug, not a filter. One
    narrow pass computes all features; one partial-agg shuffle on
    ``source``."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    feat = docs.select(
        "source",
        n.alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / n).alias(
            "distinct_ratio"
        ),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias("n_stop"),
        "n_chars",
    )
    mw = F.expr(_MW_SQL)
    flagged = feat.select(
        "source",
        F.when(F.col("n_tokens") < RULE_MIN_TOKENS, 1).otherwise(0).alias(
            "f_short"
        ),
        F.when(F.col("n_tokens") > RULE_MAX_TOKENS, 1).otherwise(0).alias(
            "f_long"
        ),
        F.when(
            (mw < RULE_MIN_MEAN_WORDLEN) | (mw > RULE_MAX_MEAN_WORDLEN), 1
        )
        .otherwise(0)
        .alias("f_wordlen"),
        F.when(F.col("distinct_ratio") < RULE_MIN_DISTINCT_RATIO, 1)
        .otherwise(0)
        .alias("f_diversity"),
        F.when(F.col("n_stop") == 0, 1).otherwise(0).alias("f_nostop"),
    )
    all_rules = (
        F.col("f_short")
        + F.col("f_long")
        + F.col("f_wordlen")
        + F.col("f_diversity")
        + F.col("f_nostop")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("f_short").alias("n_fail_short"),
            F.sum("f_long").alias("n_fail_long"),
            F.sum("f_wordlen").alias("n_fail_wordlen"),
            F.sum("f_diversity").alias("n_fail_diversity"),
            F.sum("f_nostop").alias("n_fail_nostop"),
            F.sum(F.when(all_rules == 0, 1).otherwise(0)).alias("n_pass"),
        )
        .orderBy("source")
    )


@register(
    "ta_unigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
tf AS (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM tf),
surprisal AS (
  SELECT tok.doc_id,
         CAST(round(ln(tot.n / CAST(tf.cnt AS DOUBLE)), 8)
              AS DECIMAL(18,8)) AS s
  FROM tok JOIN tf USING (t) CROSS JOIN tot
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_surprisal
FROM surprisal
GROUP BY doc_id
ORDER BY doc_id
""",
    description="mean token surprisal under a corpus-wide unigram LM"
    " (CCNet-style perplexity proxy): rank documents by how 'surprising'"
    " their tokens are — the cheap first-stage quality ranking before an"
    " expensive LM-perplexity pass",
    tags=("text", "quality", "lm"),
)
def ta_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surprisal(t) = ln(N / count(t)); a doc's mean surprisal is high
    when its tokens are rare corpus-wide (CCNet uses a real LM; the
    unigram proxy is the standard cheap tier). Shape: one explode →
    token-count partial agg (shuffles (token, count), never docs) →
    broadcast the tiny vocab back → per-doc agg. Cross-engine
    determinism: each token's surprisal is rounded to 8 decimals then
    summed as DECIMAL (exact, order-independent), so the mean is
    bit-identical regardless of aggregation order."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    tf = tok.groupBy("t").agg(F.count("*").alias("cnt"))
    total = tf.agg(F.sum("cnt").cast("double").alias("n"))
    surprisal = (
        tok.join(F.broadcast(tf), "t")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(
                F.log(F.col("n") / F.col("cnt").cast("double")), 8
            )
            .cast("decimal(18,8)")
            .alias("s"),
        )
    )
    return (
        surprisal.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum("s").cast("double") / F.count("*"), 6
            ).alias("mean_surprisal"),
        )
        .orderBy("doc_id")
    )


#: Temperature-mix batch size: expected docs per epoch of B samples.
MIX_BATCH = 1000


@register(
    "ta_mix_temperature",
    oracle=f"""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(round(sqrt(COUNT(*)), 6) AS DECIMAL(18,6)) AS srt
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_docs) AS DOUBLE) AS n_total,
         CAST(SUM(srt) AS DOUBLE) AS srt_total
  FROM per_src
)
SELECT p.source,
       p.n_docs,
       round(p.n_docs / t.n_total, 6) AS raw_share,
       round(CAST(p.srt AS DOUBLE) / t.srt_total, 6) AS temp_share,
       CAST(round({MIX_BATCH} * CAST(p.srt AS DOUBLE) / t.srt_total, 0)
            AS BIGINT) AS expected_docs
FROM per_src p CROSS JOIN tot t
ORDER BY p.source
""",
    description="temperature-scaled mixture weights per source"
    " (w ∝ sqrt(n), i.e. T=2 flattening): raw vs flattened share and"
    " expected docs per 1000-sample epoch — the mixture-planning rule"
    " multilingual training uses so small sources are not drowned out",
    tags=("text", "mixture", "sampling"),
)
def ta_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w_i = n_i^(1/T) / Σ n_j^(1/T) with T=2 (sqrt — the flattening
    used by multilingual BERT/T5-style mixing, public). Determinism:
    sqrt(n) is IEEE-correctly-rounded in both engines; it is rounded to
    6 decimals and summed as DECIMAL so the normalizing total is exact
    and order-independent; the final shares divide identical doubles.
    Cost: one partial-agg shuffle on source, then a 1-row broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sqrt(F.count("*")), 6).cast("decimal(18,6)").alias("srt"),
    )
    tot = per_src.agg(
        F.sum("n_docs").cast("double").alias("n_total"),
        F.sum("srt").cast("double").alias("srt_total"),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_total"), 6).alias("raw_share"),
            F.round(
                F.col("srt").cast("double") / F.col("srt_total"), 6
            ).alias("temp_share"),
            F.round(
                MIX_BATCH * F.col("srt").cast("double") / F.col("srt_total"), 0
            )
            .cast("long")
            .alias("expected_docs"),
        )
        .orderBy("source")
    )


#: Shard count for deterministic sharding.
N_SHARDS = 16

_SHARD_SPARK = (
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
    f" AS BIGINT) % {N_SHARDS}"
)
_SHARD_DUCK = (
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)"
    f" AS BIGINT) % {N_SHARDS}"
)


@register(
    "ta_shard_assign",
    oracle=f"""
WITH sharded AS (
  SELECT {_SHARD_DUCK} AS shard,
         doc_id,
         source,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       COUNT(DISTINCT source) AS n_sources,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM sharded
GROUP BY shard
ORDER BY shard
""",
    description=f"deterministic md5-bucket shard assignment ({N_SHARDS}"
    " shards) with per-shard balance stats (docs, tokens, source spread)"
    " — the reproducible global shuffle training-data layout uses instead"
    " of rand()",
    tags=("text", "sampling", "sharding"),
)
def ta_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard = fold(md5(doc_id)) mod N — a pure function of the row, so
    the same doc lands in the same shard on any engine, any
    partitioning, any day (the property rand()-based shuffles lack, and
    the reason reproducible-training pipelines shard by hash). The
    balance stats are the acceptance check: near-uniform docs/tokens
    per shard and full source spread. At 100 TB this column IS the
    repartition/write-partition key; here one partial-agg shuffle on
    the 16 shard keys."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.expr(_SHARD_SPARK).alias("shard"),
            "doc_id",
            "source",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.count_distinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )


#: Corpus-prefix cutoffs for the vocabulary-growth curve (doc_id order).
VOCAB_CUTOFFS = (100, 200, 300, 400, 500)


@register(
    "ta_vocab_growth",
    oracle=f"""
WITH cut AS (SELECT unnest([{", ".join(map(str, VOCAB_CUTOFFS))}]) AS cutoff),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
first_seen AS (SELECT t, MIN(doc_id) AS first_doc FROM tok GROUP BY t),
vocab AS (
  SELECT c.cutoff, COUNT(*) AS vocab_size
  FROM first_seen f JOIN cut c ON f.first_doc < c.cutoff
  GROUP BY c.cutoff
),
vol AS (
  SELECT c.cutoff,
         COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS total_tokens
  FROM documents d JOIN cut c ON d.doc_id < c.cutoff
  GROUP BY c.cutoff
)
SELECT v.cutoff,
       vol.n_docs,
       vol.total_tokens,
       v.vocab_size,
       round(CAST(v.vocab_size AS DOUBLE) / vol.total_tokens, 6)
         AS type_token_ratio
FROM vocab v JOIN vol USING (cutoff)
ORDER BY v.cutoff
""",
    description="vocabulary-growth (Heaps'-law) curve: distinct-token"
    " count and type-token ratio at increasing corpus prefixes — the"
    " audit that sizes tokenizer vocabulary and predicts how much new"
    " text still grows the vocab",
    tags=("text", "tokens", "vocab"),
)
def ta_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law (V ∝ N^β, public) is what this curve estimates
    empirically; tokenizer training reads it to decide when vocabulary
    has saturated. Shape: each token's FIRST document (one partial-agg
    shuffle on token — never a per-cutoff rescan of the corpus), then
    the cutoff sweep is a broadcast join against the tiny first-seen
    table; doc volume per cutoff is a second broadcast sweep over
    per-doc counts. Both sides scale as vocab/doc counts, not token
    occurrences."""
    docs = load_table(spark, sf_dir, "documents")
    cut = docs.limit(1).select(
        F.explode(F.array(*[F.lit(c) for c in VOCAB_CUTOFFS])).alias("cutoff")
    )
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    first_seen = tok.groupBy("t").agg(F.min("doc_id").alias("first_doc"))
    vocab = (
        first_seen.join(
            F.broadcast(cut), F.col("first_doc") < F.col("cutoff")
        )
        .groupBy("cutoff")
        .agg(F.count("*").alias("vocab_size"))
    )
    vol = (
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
        .join(F.broadcast(cut), F.col("doc_id") < F.col("cutoff"))
        .groupBy("cutoff")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    return (
        vocab.join(vol, "cutoff")
        .select(
            "cutoff",
            "n_docs",
            "total_tokens",
            "vocab_size",
            F.round(
                F.col("vocab_size").cast("double") / F.col("total_tokens"), 6
            ).alias("type_token_ratio"),
        )
        .orderBy("cutoff")
    )


#: Per-source token cap for the composed dedup→budget pipeline.
PIPE_TOKEN_CAP = 800


@register(
    "ta_dedup_budget_pipeline",
    oracle=f"""
WITH kept AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY doc_id) AS dup_rn
  FROM documents
),
dedup AS (SELECT source, doc_id, n_tokens FROM kept WHERE dup_rn = 1),
running AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM dedup
)
SELECT r.source,
       t.n_total,
       COUNT(*) AS n_kept,
       t.n_total - COUNT(*) AS n_dropped,
       CAST(SUM(r.n_tokens) AS BIGINT) AS tokens_kept,
       COUNT(CASE WHEN r.cum_tokens <= {PIPE_TOKEN_CAP} THEN 1 END)
         AS n_in_budget
FROM running r
JOIN (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source) t
  USING (source)
GROUP BY r.source, t.n_total
ORDER BY r.source
""",
    description="composed pipeline: exact dedup (keep-first per md5) into"
    " a per-source token budget (running cumsum window) — the chained"
    " dedup→budget shape real training pipelines run, hash-checked as"
    " one plan",
    tags=("text", "dedup", "mixture", "pipeline"),
)
def ta_dedup_budget_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operators must COMPOSE without materialization boundaries: this
    chains dd_exact_stats' keep-first rule into ta_token_budget's
    per-source cumsum window as one Catalyst plan — dedup's window
    (md5(text) key) and the budget's window (source key) each shuffle
    once on their own key, and nothing collects in between. The hash
    check covers the composition semantics (a doc dropped by dedup must
    not consume budget), which per-operator checks cannot see."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    kept = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.row_number()
        .over(Window.partitionBy(F.md5("text")).orderBy("doc_id"))
        .alias("dup_rn"),
    )
    dedup = kept.filter(F.col("dup_rn") == 1)
    running = dedup.withColumn(
        "cum_tokens",
        F.sum("n_tokens").over(
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    totals = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    return (
        running.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            F.count(
                F.when(F.col("cum_tokens") <= PIPE_TOKEN_CAP, 1)
            ).alias("n_in_budget"),
        )
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            "n_total",
            "n_kept",
            (F.col("n_total") - F.col("n_kept")).alias("n_dropped"),
            "tokens_kept",
            "n_in_budget",
        )
        .orderBy("source")
    )
