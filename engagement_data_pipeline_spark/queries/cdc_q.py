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
