"""Shared fixtures for the column-view stress tools
(views_refresh_stress.py, views_shared_stress.py): ONE synthetic
imputed-messages generator and scale constants, so the two
SCALE_EVIDENCE benchmarks measure the SAME workload by construction —
a shape change (e.g. a new label field) lands in both or neither.
"""

from __future__ import annotations

import os

FACTORS = (1, 3, 10)
BASE_PARTICIPANTS = 2_000
MSGS_PER_PARTICIPANT = 40  # 80k/240k/800k rows


def stress_session(app_name: str):
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{os.cpu_count()}]")
             .appName(app_name)
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def synthetic_imputed(spark, parts: int, n: int):
    """Imputed-messages-shaped rows: alternating demog/RQA datasets,
    one Label struct per message, participant ids cycling over
    `parts`."""
    from pyspark.sql import functions as F

    return spark.range(0, n).select(
        F.concat(F.lit("m"), F.col("id").cast("string"))
        .alias("message_id"),
        F.concat(F.lit("p"), (F.col("id") % parts).cast("string"))
        .alias("participant_uuid"),
        F.when(F.col("id") % 4 == 0, F.lit("gender"))
        .otherwise(F.lit("s01e01")).alias("dataset"),
        F.timestamp_micros(F.col("id") * 1000).alias("timestamp"),
        F.concat(F.lit("msg "), (F.col("id") % 97).cast("string"))
        .alias("text"),
        F.expr(
            "array(named_struct('scheme_id', CASE WHEN id % 4 = 0 "
            "THEN 'gender_scheme' ELSE 's01e01_theme_scheme' END, "
            "'code_id', 'code_' || CAST(id % 5 AS STRING), "
            "'date_time_utc', timestamp_micros(0), "
            "'checked', true, 'origin_id', 'syn'))").alias("labels"),
        F.lit("telegram").alias("channel_operator"))


def recode_m5(rows):
    """The fixed-size change both tools apply: recode message m5's
    label (one touched participant)."""
    from pyspark.sql import functions as F

    return (rows.where(F.col("message_id") == "m5")
            .withColumn("labels", F.expr(
                "transform(labels, l -> named_struct("
                "'scheme_id', l.scheme_id, 'code_id', 'recoded', "
                "'date_time_utc', l.date_time_utc, 'checked', "
                "l.checked, 'origin_id', l.origin_id))")))
