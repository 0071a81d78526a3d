"""Registry queries for the export sinks (K2/K3), the CSV ingest
source (S8), and the scalar cleaning functions (X1-X5), each with an
exact DuckDB oracle.

The S8 query round-trips: events rows are rendered to CSV-style
`Sender/Message/ReceivedOn` strings (three rotating datetime formats)
in BOTH engines, then our multi-format parse + timezone shift +
dataset routing runs on the Spark side while the oracle mirrors it
with try_strptime — so what's verified is the ingest logic itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaners import normalise_urn, operator_from_urn, validate_phone
from ..labels.config import CONTROL_CODES
from ..sinks.exports import analysis_matrix, production_columns
from ..sources.csv_ingest import csv_to_messages
from ..tables import load
from . import engagement
from ._helpers import apply_runtime_conf, micros
from .engagement import CONFIG

_MV = f"WITH mv AS ({engagement.MESSAGES_VIEW_SQL})"
_PV = f"WITH pv AS ({engagement.PARTICIPANTS_VIEW_SQL})"


# --- K2 production columns ----------------------------------------------

def k2_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    return production_columns(engagement.messages_view(spark, sf_dir), CONFIG)


K2_PRODUCTION_SQL = _MV + f"""
SELECT participant_uuid, timestamp_us,
       {", ".join(d.raw_field for d in CONFIG.datasets)}
FROM mv
"""


# --- K3 analysis matrix --------------------------------------------------

# Code inventories per scheme (the CodeScheme dimension, SURVEY §1.3):
# synthetic normal codes + the control codes every scheme carries.
SCHEME_CODES: dict[str, list[str]] = {
    "gender_scheme": [f"code_{i}" for i in range(7)] + CONTROL_CODES,
    "age_scheme": [f"age_{n}" for n in range(10, 85)] + CONTROL_CODES,
    "age_category_scheme": ["age_10_to_14", "age_15_to_17", "age_18_to_35",
                            "age_36_to_54", "age_55_plus"] + CONTROL_CODES,
    "location_scheme": [f"code_{i}" for i in range(7)] + CONTROL_CODES,
    "location_county_scheme": [f"county_{i}" for i in range(4)] + CONTROL_CODES,
    "location_region_scheme": [f"region_{i}" for i in range(3)] + CONTROL_CODES,
    "s01e01_theme_scheme": [f"code_{i}" for i in range(7)] + CONTROL_CODES,
    "s01e01_sentiment_scheme": [f"scode_{i}" for i in range(5)] + CONTROL_CODES,
    "s01e02_theme_scheme": [f"code_{i}" for i in range(7)] + CONTROL_CODES,
    "s01e02_sentiment_scheme": [f"scode_{i}" for i in range(5)] + CONTROL_CODES,
}


def k3_analysis_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analysis_matrix(engagement.participants_view(spark, sf_dir),
                           CONFIG, SCHEME_CODES)


def _k3_sql() -> str:
    cols = ["participant_uuid", "consent_withdrawn"]
    for d in CONFIG.datasets:
        cols.append(d.raw_field)
        for cc in d.coding_configs:
            name = cc.coded_field.removesuffix("_codes")
            for code in SCHEME_CODES[cc.scheme_id]:
                cols.append(
                    f"CASE WHEN list_contains(string_split({cc.coded_field}, ';'), "
                    f"'{code}') THEN 1 ELSE 0 END AS \"{name}:{code}\"")
    return _PV + "\nSELECT " + ",\n  ".join(cols) + "\nFROM pv"


K3_ANALYSIS_MATRIX_SQL = _k3_sql()


# --- S8 CSV ingest -------------------------------------------------------

S8_RANGES = [
    ("week1", "2023-12-31 21:00:00", "2024-01-10 21:00:00"),
    ("week2", "2024-01-10 21:00:00", "2024-01-20 21:00:00"),
    ("week3", "2024-01-20 21:00:00", "2024-01-28 21:00:00"),
    # events after Jan 28 21:00 UTC fall outside every range → dropped
]

_SPARK_FMTS = ["d/M/yyyy H:mm:ss", "yyyy/M/d H:mm:ss", "yyyy-M-d H:mm:ss"]
_DUCK_FMTS = ["%-d/%-m/%Y %-H:%M:%S", "%Y/%-m/%-d %-H:%M:%S",
              "%Y-%-m-%-d %-H:%M:%S"]


def s8_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    # six try_to_timestamp parses per row: spread the single-file scan
    ev = load(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism)
    fmt = F.col("event_id") % 3
    received = F.when(fmt == 0, F.date_format("ts", _SPARK_FMTS[0])) \
        .when(fmt == 1, F.date_format("ts", _SPARK_FMTS[1])) \
        .otherwise(F.date_format("ts", _SPARK_FMTS[2]))
    csv_like = ev.select(
        F.concat(F.lit("avf-participant-uuid-"),
                 F.col("user_id").cast("string")).alias("Sender"),
        F.concat(F.lit("recovered "),
                 (F.col("event_id") % 50).cast("string")).alias("Message"),
        received.alias("ReceivedOn"),
    )
    msgs = csv_to_messages(csv_like, S8_RANGES, utc_offset_hours=3)
    return msgs.select(
        F.col("origin.origin_id").alias("origin_id"),
        "participant_uuid", "text",
        micros("timestamp").alias("timestamp_us"),
        "dataset", "coda_id",
    )


def _s8_sql() -> str:
    strf = (f"CASE event_id % 3 WHEN 0 THEN strftime(ts, '{_DUCK_FMTS[0]}') "
            f"WHEN 1 THEN strftime(ts, '{_DUCK_FMTS[1]}') "
            f"ELSE strftime(ts, '{_DUCK_FMTS[2]}') END")
    parse = " , ".join(f"try_strptime(\"ReceivedOn\", '{f}')" for f in _DUCK_FMTS)
    route = " ".join(
        f"WHEN ts_utc >= TIMESTAMP '{s}' AND ts_utc < TIMESTAMP '{e}' THEN '{name}'"
        for name, s, e in S8_RANGES)
    return f"""
WITH csv_like AS (
  SELECT 'avf-participant-uuid-' || CAST(user_id AS VARCHAR) AS "Sender",
         'recovered ' || CAST(event_id % 50 AS VARCHAR) AS "Message",
         {strf} AS "ReceivedOn"
  FROM events
),
parsed AS (
  SELECT *, COALESCE({parse}) - INTERVAL 3 HOUR AS ts_utc FROM csv_like
),
routed AS (
  SELECT *, CASE {route} ELSE NULL END AS dataset
  FROM parsed WHERE ts_utc IS NOT NULL
)
SELECT 'csv:' || sha256("Sender" || '|' || "Message" || '|' || "ReceivedOn") AS origin_id,
       "Sender" AS participant_uuid, "Message" AS text,
       epoch_us(ts_utc) AS timestamp_us, dataset,
       sha256("Message") AS coda_id
FROM routed WHERE dataset IS NOT NULL
"""


S8_CSV_INGEST_SQL = _s8_sql()


# --- X1/X2/X3 cleaning functions ----------------------------------------

_PREFIX_OPERATORS = {"2547": "safaricom", "25261": "hormuud"}
_PHONE_PREFIXES = ["254700", "254615"]


def x_clean_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    ev = load(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    raw_urn = (
        F.when(F.col("user_id") % 4 == 0, F.concat(F.lit("tel:+254700"), u))
        .when(F.col("user_id") % 4 == 1, F.concat(F.lit("whatsapp:254700"), u))
        .when(F.col("user_id") % 4 == 2,
              F.concat(F.lit("telegram:10"), u, F.lit("#user"), u))
        .otherwise(F.concat(F.lit("tel:+252615"), u))
    )
    raw_phone = (
        F.when(F.col("user_id") % 3 == 0, F.concat(F.lit("0700-"), u))
        .when(F.col("user_id") % 3 == 1, F.concat(F.lit("+254 615 "), u))
        .otherwise(F.concat(F.lit("99"), u))
    )
    urn = normalise_urn(raw_urn)
    return ev.select(
        F.col("event_id"),
        raw_urn.alias("raw_urn"),
        urn.alias("urn"),
        operator_from_urn(urn, _PREFIX_OPERATORS).alias("operator"),
        validate_phone(raw_phone, "254", _PHONE_PREFIXES, 12).alias("phone"),
    ).distinct()


X_CLEAN_FUNCTIONS_SQL = """
WITH base AS (
  SELECT event_id, CAST(user_id AS VARCHAR) AS u, user_id FROM events
),
urns AS (
  SELECT event_id, user_id,
    CASE user_id % 4
      WHEN 0 THEN 'tel:+254700' || u
      WHEN 1 THEN 'whatsapp:254700' || u
      WHEN 2 THEN 'telegram:10' || u || '#user' || u
      ELSE 'tel:+252615' || u END AS raw_urn,
    CASE user_id % 3
      WHEN 0 THEN '0700-' || u
      WHEN 1 THEN '+254 615 ' || u
      ELSE '99' || u END AS raw_phone
  FROM base
),
norm AS (
  SELECT *,
    CASE WHEN starts_with(raw_urn, 'whatsapp:')
         THEN 'tel:+' || string_split(raw_urn, ':')[2]
         WHEN starts_with(raw_urn, 'telegram:')
         THEN string_split(raw_urn, '#')[1]
         ELSE raw_urn END AS urn,
    regexp_replace(raw_phone, '[^0-9]', '', 'g') AS digits
  FROM urns
),
phones AS (
  SELECT *,
    CASE WHEN starts_with(digits, '254') THEN digits
         WHEN starts_with(digits, '0') THEN '254' || substr(digits, 2)
         ELSE '254' || digits END AS with_cc
  FROM norm
)
SELECT DISTINCT event_id, raw_urn, urn,
  CASE WHEN string_split(urn, ':')[1] <> 'tel' THEN string_split(urn, ':')[1]
       WHEN starts_with(urn, 'tel:+25261') THEN 'hormuud'
       WHEN starts_with(urn, 'tel:+2547') THEN 'safaricom'
       ELSE 'unknown' END AS operator,
  CASE WHEN (starts_with(with_cc, '254700') OR starts_with(with_cc, '254615'))
            AND length(with_cc) = 12
       THEN with_cc ELSE NULL END AS phone
FROM phones
"""
