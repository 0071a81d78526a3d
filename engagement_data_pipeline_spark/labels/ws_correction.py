"""WS-correction: the dataset-move state machine (SURVEY §2.6
M10/M11).

Reference: src/engagement_db_coda_sync/lib.py:202-456. A message
carries a checked WS ("wrong scheme") control code in one of its
normal schemes AND a checked code in the special "WS – Correct
Dataset" scheme; the WS-scheme code names the dataset the message
actually belongs to. Correcting it means: reassign `dataset`, push
the old dataset onto `previous_datasets`, clear `labels`
(lib.py:413-425). If the target dataset is already in
`previous_datasets`, the message is cycling (A→B→A); the cycle fix
(lib.py:257-339) instead resets the message to its FIRST previous
dataset and empties `previous_datasets`, breaking the loop.

Spark shape: one `withColumn` pass — conditions and rewrites are all
higher-order array expressions; the downstream re-sync of the moved
message is the incremental replay (operators/incremental.py), exactly
like the reference's "message re-syncs under its new dataset on the
next increment".
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import WS
from .schema import empty_labels

WS_SCHEME_ID = "ws_correct_dataset_scheme"


def _latest(labels: Column, scheme_id: str) -> Column:
    return F.get(F.filter(labels, lambda l: l["scheme_id"] == scheme_id), 0)


def needs_ws_correction(labels: Column, normal_schemes: Sequence[str],
                        ws_scheme: str = WS_SCHEME_ID) -> Column:
    """A checked WS code in ≥1 normal scheme AND a checked code in the
    WS scheme (lib.py:202-254; the XOR case — one side without the
    other — is the M2 coding-error path, not a move)."""
    has_ws_in_normal = F.lit(False)
    for s in normal_schemes:
        lab = _latest(labels, s)
        has_ws_in_normal = has_ws_in_normal | (
            lab.isNotNull() & lab["checked"] & (lab["code_id"] == WS))
    ws_lab = _latest(labels, ws_scheme)
    return has_ws_in_normal & ws_lab.isNotNull() & ws_lab["checked"]


def apply_ws_correction(messages: DataFrame, normal_schemes: Sequence[str],
                        code_to_dataset: Mapping[str, str],
                        ws_scheme: str = WS_SCHEME_ID) -> DataFrame:
    """M10 + M11 in one projection. `code_to_dataset` maps WS-scheme
    code ids to target datasets (the reference resolves config match →
    string_value fallback → default — our map is that resolution,
    computed driver-side from config)."""
    labels = F.col("labels")
    moving = needs_ws_correction(labels, normal_schemes, ws_scheme)

    ws_code = _latest(labels, ws_scheme)["code_id"]
    target = F.lit(None).cast("string")
    for code, ds in code_to_dataset.items():
        target = F.when(ws_code == code, F.lit(ds)).otherwise(target)

    # A checked WS code with no mapped target (e.g. the reference's NC
    # "right place unknown", lib.py:249-253) must NOT move: fall
    # through to a no-op instead of clearing labels and nulling the
    # dataset.
    moving = moving & target.isNotNull()

    cycle = F.array_contains(F.col("previous_datasets"), target)

    new_dataset = (
        F.when(moving & cycle, F.get(F.col("previous_datasets"), 0))  # M11 reset
        .when(moving, target)
        .otherwise(F.col("dataset")))
    new_previous = (
        F.when(moving & cycle, F.array().cast("array<string>"))      # M11 empties history
        .when(moving, F.array_union(F.col("previous_datasets"),
                                    F.array(F.col("dataset"))))
        .otherwise(F.col("previous_datasets")))
    new_labels = F.when(moving, empty_labels()).otherwise(labels)

    return (
        messages.withColumn("__dataset", new_dataset)
        .withColumn("previous_datasets", new_previous)
        .withColumn("labels", new_labels)
        .withColumn("dataset", F.col("__dataset"))
        .drop("__dataset")
    )
