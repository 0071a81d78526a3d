"""Direct verification of the e2e fixture's MUTATION effects on the
final raw state — the one thing the capstone checksum cannot see.

`e2e_incremental_run` proves maintained == batch over the SAME
mirrored history, so a bug in the fixture's own mutation predicates
or label SQL would be invisible to it (both sides would agree on the
wrong history — the limitation documented at `_E2E_CTE`). This file
closes that blind spot: it reads the REAL fixture's final raw
snapshot at sf0.001 and asserts, class by class, that the 4-commit
history produced exactly the intended end state — recodes landed,
the cycle reset restored the original dataset with cleared labels,
the double-hop ended in `age`, emptied rows lost their text while
their out-of-order last_updated regressed 10 days, dv-dead rows are
gone and revived ones carry their base content verbatim.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.queries import e2e_q, engagement
from engagement_data_pipeline_spark.streaming.ingest import (
    read_merged_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def state(spark):
    base = e2e_q._e2e_fixture(spark, SF)
    raw = read_merged_table(spark, os.path.join(base, "raw"))
    res = (engagement._resolved(spark, SF)
           .select(*e2e_q._RAW_COLS).localCheckpoint())
    return raw.localCheckpoint(), res


def _ids(res, pred):
    return res.where(pred).select("message_id")


def _rows(df, pred_ids):
    return df.join(pred_ids, "message_id")


def test_dead_rows_absent_revived_rows_verbatim(spark, state):
    raw, res = state
    dead_gone = _ids(res, f"({e2e_q._DEAD}) AND NOT ({e2e_q._REVIVED})")
    revived = _ids(res, e2e_q._REVIVED)
    assert dead_gone.count() > 0 and revived.count() > 0
    assert _rows(raw, dead_gone).count() == 0
    # revival restored the BASE row byte-for-byte (all columns)
    got = _rows(raw, revived)
    want = _rows(res, revived)
    assert got.count() == revived.count()
    assert got.exceptAll(want).count() == 0


def test_cycle_reset_restores_dataset_and_clears_labels(spark, state):
    raw, res = state
    cyc = _ids(res, e2e_q._CYCLE)
    assert cyc.count() > 0
    bad = _rows(raw, cyc).where(
        "dataset <> 's01e02' OR size(labels) <> 0")
    assert bad.count() == 0
    assert _rows(raw, cyc).count() == cyc.count()


def test_double_hop_ends_in_age_with_cleared_labels(spark, state):
    raw, res = state
    hop = _ids(res, e2e_q._HOP2)
    assert hop.count() > 0
    bad = _rows(raw, hop).where("dataset <> 'age' OR size(labels) <> 0")
    assert bad.count() == 0


def test_emptied_rows_lose_text_and_regress_last_updated(spark, state):
    raw, res = state
    emp = res.where(e2e_q._EMPTIED).select(
        "message_id", F.col("last_updated").alias("base_lu"))
    assert emp.count() > 0
    j = raw.join(emp, "message_id")
    assert j.count() == emp.count()
    # M3 input state + the out-of-order commit: event time REGRESSED
    # exactly 10 days yet the commit-4 payload won
    bad = j.where("text <> '' OR "
                  "last_updated <> base_lu - INTERVAL 10 DAYS")
    assert bad.count() == 0


def test_recode_and_stop_labels_landed(spark, state):
    raw, res = state
    rec = _ids(res, f"({e2e_q._RECODE}) AND NOT ({e2e_q._DEAD})")
    stop = _ids(res, f"({e2e_q._STOPPED}) AND NOT ({e2e_q._DEAD})")
    assert rec.count() > 0 and stop.count() > 0
    codes = F.expr("transform(labels, l -> l.code_id)")
    bad_rec = _rows(raw, rec).where(
        ~F.array_contains(codes, "theme_recoded")
        | ~F.array_contains(codes, "scode_recoded"))
    assert bad_rec.count() == 0
    bad_stop = _rows(raw, stop).where(
        F.expr("exists(labels, l -> l.code_id <> 'STOP')")
        | (F.size("labels") == 0))
    assert bad_stop.count() == 0


def test_move_rewrote_dataset_and_scheme_ids(spark, state):
    raw, res = state
    mov = _ids(res, f"({e2e_q._MOVE}) AND NOT ({e2e_q._DEAD})")
    assert mov.count() > 0
    bad = _rows(raw, mov).where(
        (F.col("dataset") != "s01e01")
        | F.expr("exists(labels, l -> l.scheme_id LIKE 's01e02%')"))
    assert bad.count() == 0


def test_row_count_closes(spark, state):
    raw, res = state
    n_dead_gone = res.where(
        f"({e2e_q._DEAD}) AND NOT ({e2e_q._REVIVED})").count()
    assert raw.count() == res.count() - n_dead_gone
    # and every surviving key exists exactly once
    assert raw.groupBy("message_id").count().where("count > 1") \
        .count() == 0
