"""Semi-structured VARIANT path: Spark 4's open-schema JSON type.

operators/events.py covers the two fixed-schema JSON routes
(``ev_json_extract``: one known path via get_json_object;
``ev_props_map_stats``: whole bag via from_json to a map). VARIANT is
the third, schema-on-read route — ``try_parse_json`` ingests arbitrary
JSON ONCE into a typed binary encoding, and ``try_variant_get`` extracts
paths lazily with per-call target types, which is how an event pipeline
handles property bags whose schema drifts per producer (the reference
stores chunk metadata as such a free-form JSON object,
src/types.ts:5-20, src/persistence.ts:159-179).

Scale shape: parse and extraction are per-row column expressions
(narrow, codegen); the variant binary is columnar-friendly (typed
fields, no re-tokenizing per path); the only shuffle is the final
per-type partial aggregation. The planted-malformed branch exercises
the ``try_`` contract: corrupt JSON nulls the variant instead of
failing the job — at 100 TB a single bad producer must not kill the
pipeline, and the bad-row count is itself part of the hashed result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.registry import register

#: Every event_id divisible by this gets its props replaced by malformed
#: JSON, so the try_parse_json error path carries driver-hashed weight.
BAD_JSON_MOD = 10
_BAD_JSON = "{oops"


@register(
    "ev_props_variant_stats",
    oracle=f"""
WITH src AS (
  SELECT event_type,
         CASE WHEN event_id % {BAD_JSON_MOD} = 0
              THEN '{_BAD_JSON}' ELSE props END AS p
  FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN json_valid(p) THEN 0 ELSE 1 END) AS BIGINT)
         AS n_bad,
       CAST(SUM(CASE WHEN json_valid(p)
                     THEN CAST(json_extract(p, '$.k') AS BIGINT) END)
            AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN json_valid(p)
                     THEN CASE WHEN json_extract(p, '$.missing') IS NULL
                               THEN 1 ELSE 0 END
                     ELSE 0 END) AS BIGINT) AS n_missing
FROM src GROUP BY event_type ORDER BY event_type
""",
    description="VARIANT ingestion of the props bag (Spark 4"
    " try_parse_json + try_variant_get): typed path extraction, absent"
    " paths null out, planted malformed JSON nulls the variant instead"
    " of failing the job, and the bad-row census is part of the hashed"
    " result — the schema-on-read JSON route beside the fixed-schema"
    " get_json_object and from_json-map queries",
    tags=("events", "json", "variant"),
)
def ev_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All aggregates are exact BIGINT sums/counts (no float path at
    all), so cross-engine hashing is trivially stable. The oracle
    mirrors variant semantics relationally: json_valid() stands in for
    try_parse_json's null-on-error, json_extract for try_variant_get.
    Oracle hazard (caught by the r7 sf0.1 three-scale sweep): DuckDB
    does NOT guarantee row-wise short-circuit of an AND conjunct, so
    ``json_valid(p) AND json_extract(p, ...)`` can evaluate the
    extract on malformed rows (chunk-dependent — sf0.01 happened to
    pass); json_extract must sit inside a CASE branch GUARDED by
    json_valid, which DuckDB selection-vectors correctly."""
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_type",
        F.when(
            F.col("event_id") % BAD_JSON_MOD == 0, F.lit(_BAD_JSON)
        )
        .otherwise(F.col("props"))
        .alias("p"),
    ).withColumn("v", F.try_parse_json("p"))
    k = F.try_variant_get("v", "$.k", "bigint")
    missing = F.try_variant_get("v", "$.missing", "bigint")
    return (
        src.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias(
                "n_bad"
            ),
            F.sum(k).alias("sum_k"),
            F.sum(
                F.when(F.col("v").isNotNull() & missing.isNull(), 1)
                .otherwise(0)
            ).alias("n_missing"),
        )
        .orderBy("event_type")
    )
