"""Registry query for the CDC snapshot-diff operator (operators/
cdc.py): the changeset between the mid-watermark state of the
versioned messages table and its final state.

The cut is the midpoint of the observed last_updated range — computed
as one O(1) aggregate (the same driver-side watermark-scalar pattern
as operators/incremental.py), integer micros so both engines agree
exactly. Old snapshot = latest version per message among versions at
or before the cut; new snapshot = latest overall. The fixture
exercises all three ops end-to-end: messages first versioned after the
cut are inserts, re-versioned messages whose latest label/dataset
changed are updates, and the operator's delete path is covered by
tests/test_cdc.py (the append-only fixture cannot delete)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import versioned_changeset
from ..sources.synthetic import latest_cte
from . import engagement
from ._helpers import micros

#: Null-safe compared columns (flattened label mirror, messages_latest
#: idiom: labels[0] is the demog/theme label, label2 the sentiment).
_COMPARE = ["dataset", "status", "text", "label_code"]


def cdc_changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan form: both snapshots come from one versioned table,
    so `versioned_changeset` computes old/new state per message in ONE
    grouped aggregation (no windows, no join — see operators/cdc.py);
    the generic two-table `snapshot_diff` is unit-tested in
    tests/test_cdc.py and yields the identical changeset here."""
    msgs = engagement._messages(spark, sf_dir)
    lo, hi = msgs.agg(F.min(micros("last_updated")),
                      F.max(micros("last_updated"))).first()
    cut = (lo + hi) // 2
    flat = msgs.select(
        "message_id", "dataset", "status", "text",
        F.get(F.col("labels"), 0)["code_id"].alias("label_code"),
        micros("last_updated").alias("lu_us"))
    return versioned_changeset(flat, ["message_id"], "lu_us",
                               F.lit(cut), _COMPARE)


CDC_CHANGESET_SQL = "WITH " + latest_cte() + """,
cut AS (
  SELECT (MIN(epoch_us(last_updated)) + MAX(epoch_us(last_updated))) // 2 AS t
  FROM messages
),
old_latest AS (
  SELECT * FROM (
    SELECT message_id, dataset, status, text,
           COALESCE(label2_code, label_code) AS label_code,
           ROW_NUMBER() OVER (
             PARTITION BY message_id
             ORDER BY last_updated DESC, message_id DESC) AS rn
    FROM messages WHERE epoch_us(last_updated) <= (SELECT t FROM cut)
  ) WHERE rn = 1
),
new_latest AS (
  SELECT message_id, dataset, status, text,
         COALESCE(label2_code, label_code) AS label_code
  FROM latest
),
diff AS (
  SELECT COALESCE(o.message_id, n.message_id) AS message_id,
         CASE WHEN o.message_id IS NULL THEN 'insert'
              WHEN n.message_id IS NULL THEN 'delete'
              ELSE 'update' END AS op,
         CASE WHEN o.message_id IS NULL OR n.message_id IS NULL THEN ''
              ELSE concat_ws(',',
                CASE WHEN o.dataset    IS DISTINCT FROM n.dataset    THEN 'dataset' END,
                CASE WHEN o.status     IS DISTINCT FROM n.status     THEN 'status' END,
                CASE WHEN o.text       IS DISTINCT FROM n.text       THEN 'text' END,
                CASE WHEN o.label_code IS DISTINCT FROM n.label_code THEN 'label_code' END)
         END AS changed_cols
  FROM old_latest o
  FULL OUTER JOIN new_latest n ON o.message_id = n.message_id
)
SELECT message_id, op, changed_cols FROM diff
WHERE op <> 'update' OR changed_cols <> ''
"""


# --- SCD Type-2 dimension build ------------------------------------------

#: Tracked dimension state. The synthetic v2 snapshots re-code labels
#: (changed) but rarely change dataset/status (unchanged unless
#: moved), so change compression is exercised in both directions:
#: some re-snapshots open a new interval, others collapse away.
_SCD2_STATE = ["dataset", "status", "label_code"]


def scd2_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history over the versioned messages table: one row
    per (message, distinct consecutive state) with half-open
    validity intervals and an `is_current` flag — `scd2_from_versions`
    compresses unchanged re-snapshots and assembles intervals in one
    key-partitioned shuffle (operators/cdc.py)."""
    from ..operators.cdc import scd2_from_versions

    msgs = engagement._messages(spark, sf_dir)
    flat = msgs.select(
        "message_id", "dataset", "status",
        F.get(F.col("labels"), 0)["code_id"].alias("label_code"),
        micros("last_updated").alias("lu_us"))
    return (scd2_from_versions(flat, ["message_id"], "lu_us", _SCD2_STATE)
            .select("message_id", *_SCD2_STATE,
                    F.col("valid_from").alias("valid_from_us"),
                    F.col("valid_to").alias("valid_to_us"),
                    "is_current"))


SCD2_MESSAGES_SQL = "WITH " + latest_cte() + """,
flat AS (
  SELECT message_id, dataset, status,
         COALESCE(label2_code, label_code) AS label_code,
         epoch_us(last_updated) AS lu_us
  FROM messages
),
marked AS (
  SELECT *,
         (ROW_NUMBER() OVER w = 1
          OR dataset    IS DISTINCT FROM LAG(dataset)    OVER w
          OR status     IS DISTINCT FROM LAG(status)     OVER w
          OR label_code IS DISTINCT FROM LAG(label_code) OVER w) AS opens
  FROM flat
  WINDOW w AS (PARTITION BY message_id ORDER BY lu_us, message_id)
),
compressed AS (SELECT * FROM marked WHERE opens)
SELECT message_id, dataset, status, label_code,
       lu_us AS valid_from_us,
       LEAD(lu_us) OVER (PARTITION BY message_id
                         ORDER BY lu_us, message_id) AS valid_to_us,
       (LEAD(lu_us) OVER (PARTITION BY message_id
                          ORDER BY lu_us, message_id) IS NULL) AS is_current
FROM compressed
"""
