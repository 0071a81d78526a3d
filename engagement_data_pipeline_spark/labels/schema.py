"""Message / Label / Origin Spark schemas.

Mirrors the reference's document model (SURVEY §1.1-1.2; reference
field evidence: src/rapid_pro_to_engagement_db/rapid_pro_to_engagement_db.py:365-376,
src/common/get_messages_in_datasets.py:10-27). The labels array is
**newest-first**: new labels are prepended (reference
code_imputation_functions.py:53-54), so "the latest label per scheme"
is the first array element whose scheme matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Label: {scheme_id, code_id, date_time_utc, checked, origin_id}
# (reference label construction: code_imputation_functions.py:28-34)
LABEL_TYPE = StructType([
    StructField("scheme_id", StringType()),
    StructField("code_id", StringType()),
    StructField("date_time_utc", TimestampType()),
    StructField("checked", BooleanType()),
    StructField("origin_id", StringType()),
])

LABELS_TYPE = ArrayType(LABEL_TYPE)

# Origin: provenance of the message in its source system
# (reference: rapid_pro_to_engagement_db.py:373-376)
ORIGIN_TYPE = StructType([
    StructField("origin_id", StringType()),
    StructField("origin_type", StringType()),
])

MESSAGE_SCHEMA = StructType([
    StructField("message_id", StringType(), nullable=False),
    StructField("participant_uuid", StringType()),
    StructField("text", StringType()),
    StructField("timestamp", TimestampType()),
    StructField("direction", StringType()),
    StructField("channel_operator", StringType()),
    StructField("status", StringType()),           # live | stale
    StructField("dataset", StringType()),
    StructField("previous_datasets", ArrayType(StringType())),
    StructField("labels", LABELS_TYPE),
    StructField("origin", ORIGIN_TYPE),
    StructField("coda_id", StringType()),
    StructField("last_updated", TimestampType()),
])


def empty_labels() -> Column:
    """A typed empty labels array (moved messages have labels cleared,
    reference lib.py:413-425)."""
    return F.array().cast(LABELS_TYPE)


def make_label(scheme_id: Column, code_id: Column, date_time_utc: Column,
               checked: Column, origin_id: Column) -> Column:
    """Build one Label struct column with canonical field order."""
    return F.struct(
        scheme_id.alias("scheme_id"),
        code_id.alias("code_id"),
        date_time_utc.alias("date_time_utc"),
        checked.alias("checked"),
        origin_id.alias("origin_id"),
    )
