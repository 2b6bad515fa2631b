"""Training-corpus preparation operators: sequence packing and PII scrub.

Two LLM-data-pipeline steps downstream of filtering/dedup (the
beyond-reference directive; the reference itself stops at chunking,
src/indexer.ts:201-215):

- **sequence packing**: concatenate documents into fixed token-budget
  training sequences. The deterministic contiguous-fill variant used
  here (running token cumsum within a source, pack = budget window the
  document *starts* in) is fully expressible with partitioned window
  aggregation — no UDF, no driver loop — and is the shape that scales:
  each source packs independently, so the window sort is per-source,
  never global.
- **PII scrubbing**: regex detection + redaction of emails/phone
  numbers. The fixture corpus is synthetic word soup with no real PII
  (FIXTURES.md A1), so the query *injects* deterministic synthetic PII
  into a doc_id-keyed subset first — making the assertion a real
  round-trip test of the detect/redact expressions on both engines
  rather than a vacuous 0=0 match.

Both stay entirely in whole-stage codegen (string/regex/window
expressions); the only shuffles are the per-source window and the final
group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.registry import register

#: Tokens per packed training sequence (whitespace tokenizer — the same
#: counter as ta_token_stats; real pipelines swap in the BPE count).
PACK_BUDGET = 512

#: Portable regexes (same semantics under Java regex and RE2): email and
#: a NANP-style 555 phone fragment. Kept deliberately simple — the
#: operator's contract is the detect/redact plumbing, not regex recall.
EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"555-[0-9]{4}"


@register(
    "ta_pack_sequences",
    oracle=f"""
WITH toked AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM toked
)
SELECT source,
       CAST(floor((cum_tokens - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM cum
GROUP BY source, pack_id
ORDER BY source, pack_id
""",
    description="sequence packing: contiguous fill of per-source token"
    " budgets (running cumsum window), per-pack doc counts and token"
    " totals — the batch-assembly step before training",
    tags=("text", "tokens", "mixture", "packing"),
    bench=True,
)
def ta_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contiguous packing: docs are laid out in doc_id
    order within their source; a document belongs to the pack its first
    token lands in (``floor((cumsum - n_tokens) / budget)``), so packs
    may overshoot the budget by at most one document — the standard
    greedy-fill used when sequence boundaries must be reproducible.

    Scale shape: the window partitions by ``source``, so each source
    sorts only its own (doc_id, n_tokens) pairs — at 100 TB that is a
    per-source shuffle + sort, never a single-reducer global window (the
    anti-pattern chunks_table was cured of; see functions/ids.py). The
    pack aggregation reuses the same partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    toked = docs.select("source", "doc_id", n_tokens.alias("n_tokens"))
    return (
        pack_docs(toked)
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "pack_id")
    )


def pack_docs(toked: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Per-doc pack assignment: (source, doc_id, n_tokens) → + pack_id.

    Contiguous fill in doc_id order within each source: a doc joins the
    pack its first token lands in. Pure window arithmetic (partitioned
    cumsum), so the assignment is engine- and partitioning-independent.
    """
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toked.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.withColumn(
        "pack_id", F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget)
    )


@register(
    "ta_pii_scrub",
    oracle=f"""
WITH aug AS (
  SELECT doc_id, source,
    text
      || CASE WHEN doc_id % 7 = 0
              THEN ' contact user' || doc_id || '@example.com now'
              ELSE '' END
      || CASE WHEN doc_id % 11 = 0
              THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END
      AS text
  FROM documents
),
scrub AS (
  SELECT doc_id, source,
    len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
    len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
    length(text) AS raw_len,
    length(regexp_replace(regexp_replace(text,
        '{EMAIL_RE}', '[EMAIL]', 'g'),
        '{PHONE_RE}', '[PHONE]', 'g')) AS clean_len
  FROM aug
)
SELECT doc_id, source, n_emails, n_phones, raw_len, clean_len,
       raw_len - clean_len AS removed_chars
FROM scrub
WHERE n_emails + n_phones > 0
ORDER BY doc_id
""",
    description="PII scrub: regex email/phone detection + redaction"
    " counts over a deterministically PII-injected corpus — the"
    " compliance pass every training pipeline runs before release",
    tags=("text", "pii", "quality"),
    bench=True,
)
def ta_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic PII is appended to doc_id % 7 == 0 (an email) and
    doc_id % 11 == 0 (a phone) rows — deterministic, engine-independent
    string construction — then detected with ``regexp_count`` and
    redacted with ``regexp_replace`` (Spark replaces all matches by
    default; the DuckDB twin needs the explicit ``'g'`` flag).

    Scale shape: a single narrow projection — regex match/replace per
    row inside codegen, no shuffle at all until the (filtered, tiny)
    result's output sort. Redaction of a 100 TB corpus is exactly this
    plan: scan → regexp_replace → write, embarrassingly parallel.
    """
    docs = load_table(spark, sf_dir, "documents")
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
        F.regexp_replace(F.col("text"), EMAIL_RE, "[EMAIL]"),
        PHONE_RE,
        "[PHONE]",
    )
    return (
        docs.select("doc_id", "source", aug.alias("text"))
        .select(
            "doc_id",
            "source",
            F.regexp_count("text", F.lit(EMAIL_RE)).alias("n_emails"),
            F.regexp_count("text", F.lit(PHONE_RE)).alias("n_phones"),
            F.length("text").alias("raw_len"),
            F.length(scrubbed).alias("clean_len"),
        )
        .withColumn("removed_chars", F.col("raw_len") - F.col("clean_len"))
        .filter(F.col("n_emails") + F.col("n_phones") > 0)
        .orderBy("doc_id")
    )
