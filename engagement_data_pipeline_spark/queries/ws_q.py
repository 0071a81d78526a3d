"""Registry query for the WS-correction state machine (M10/M11,
SURVEY §7 "What's hard" #2; reference lib.py:202-456), driven to
fixpoint through the oracle.

The synthetic messages carry no pre-move WS codes (the driver data
records post-move states), so this query deterministically injects a
WS scenario into the latest snapshots and applies two correction
rounds:

* round 1 — RQA messages with event_id%5==2 get a checked WS code in
  their theme scheme plus a checked WS-scheme code naming the OTHER
  episode → M10 move (dataset swaps, old dataset pushed to
  previous_datasets, labels cleared). The event_id%25==7 subset gets
  an UNMAPPED WS-scheme code instead → must be a no-op (the
  reference's "right place unknown" refusal, lib.py:249-253).
* round 2 — the even-event_id moved rows get a second WS code naming
  their ORIGINAL dataset → the A→B→A cycle, so the M11 cycle fix
  resets dataset to previous_datasets[0] and empties the history.

Every path (move, cycle reset, unmapped no-op, untouched) is a
closed-form function of event_id, so the DuckDB oracle mirrors the
final state exactly and the whole state machine is value-hash
checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..labels.config import WS
from ..labels.schema import make_label
from ..labels.ws_correction import WS_SCHEME_ID, apply_ws_correction
from ..operators.dedup import latest_snapshot
from ..sources.synthetic import RQA_DATASETS, latest_cte
from . import engagement

_NORMAL_SCHEMES = [f"{d}_theme_scheme" for d in RQA_DATASETS]
_CODE_TO_DATASET = {f"ws_{d}": d for d in RQA_DATASETS}


def _other(dataset) -> F.Column:
    return (F.when(dataset == "s01e01", F.lit("s01e02"))
            .otherwise(F.lit("s01e01")))


def _inject(df: DataFrame, cond, ws_code) -> DataFrame:
    """Replace `labels` with [checked WS in the current theme scheme,
    checked `ws_code` in the WS scheme] where `cond` holds."""
    origin = F.concat(F.lit("ws-origin-"), F.col("message_id"))
    injected = F.array(
        make_label(
            scheme_id=F.concat(F.col("dataset"), F.lit("_theme_scheme")),
            code_id=F.lit(WS),
            date_time_utc=F.col("last_updated"),
            checked=F.lit(True),
            origin_id=origin,
        ),
        make_label(
            scheme_id=F.lit(WS_SCHEME_ID),
            code_id=ws_code,
            date_time_utc=F.col("last_updated"),
            checked=F.lit(True),
            origin_id=origin,
        ),
    )
    return df.withColumn(
        "labels", F.when(cond, injected).otherwise(F.col("labels")))


def ws_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    latest = latest_snapshot(engagement._messages(spark, sf_dir),
                             ["message_id"], ["last_updated", "message_id"])
    eid = F.split(F.col("message_id"), "-")[1].cast("long")
    rqa = F.col("dataset").isin(RQA_DATASETS)

    inj1 = rqa & (eid % 5 == 2)
    unmapped = eid % 25 == 7
    ws_code1 = (F.when(unmapped, F.lit("ws_nowhere"))
                .otherwise(F.concat(F.lit("ws_"), _other(F.col("dataset")))))
    round1 = apply_ws_correction(
        _inject(latest, inj1, ws_code1), _NORMAL_SCHEMES, _CODE_TO_DATASET)

    # Cycle the even-id moved rows back: their current dataset is the
    # other episode, the injected target is the original one — which
    # sits in previous_datasets, so M11 fires.
    inj2 = rqa & (eid % 5 == 2) & ~unmapped & (eid % 2 == 0)
    ws_code2 = F.concat(F.lit("ws_"), _other(F.col("dataset")))
    round2 = apply_ws_correction(
        _inject(round1, inj2, ws_code2), _NORMAL_SCHEMES, _CODE_TO_DATASET)

    return round2.select(
        "message_id",
        "dataset",
        F.concat_ws(",", "previous_datasets").alias("prev_csv"),
        F.size("labels").cast("long").alias("n_labels"),
    )


WS_FIXPOINT_SQL = "WITH " + latest_cte() + """,
grp AS (
  SELECT *,
    (dataset IN ('s01e01','s01e02') AND event_id % 5 = 2) AS inj1,
    (event_id % 25 = 7) AS u25
  FROM latest
)
SELECT message_id,
  -- cycle rows (even id) end back at their original dataset; odd-id
  -- moved rows stay at the other episode; everyone else unchanged
  CASE WHEN inj1 AND NOT u25 AND event_id % 2 = 1
         THEN CASE dataset WHEN 's01e01' THEN 's01e02' ELSE 's01e01' END
       ELSE dataset END AS dataset,
  CASE WHEN inj1 AND NOT u25 AND event_id % 2 = 1 THEN dataset
       WHEN inj1 AND NOT u25 AND event_id % 2 = 0 THEN ''
       ELSE COALESCE(previous_dataset, '') END AS prev_csv,
  CAST(CASE WHEN inj1 AND NOT u25 THEN 0
            WHEN inj1 AND u25 THEN 2
            WHEN label_scheme IS NULL THEN 0
            WHEN label2_scheme IS NULL THEN 1
            ELSE 2 END AS BIGINT) AS n_labels
FROM grp
"""
