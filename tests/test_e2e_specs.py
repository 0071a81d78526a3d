"""Schema pinning for the e2e lifecycle capstone (queries/e2e_q.py):
every member's authored (column, dtype) spec must match what its
DuckDB oracle SQL actually produces — the cheap half of the
correctness gate, runnable without building the heavy fixture.
(The Spark side is asserted at runtime by families.member_checksum;
the value equality is the driver's hash compare.)"""

from __future__ import annotations

import duckdb
import pytest

from engagement_data_pipeline_spark.queries import e2e_q

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS "
                  f"SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("member", sorted(e2e_q._MEMBER_SQL))
def test_member_oracle_columns_match_spec(con, member):
    rel = con.sql(f"SELECT * FROM ({e2e_q._MEMBER_SQL[member]}) q LIMIT 0")
    assert sorted(rel.columns) == sorted(
        c for c, _t in e2e_q._SPECS[member])


def test_capstone_oracle_has_all_members(con):
    rows = con.execute(
        f"SELECT member FROM ({e2e_q.E2E_INCREMENTAL_RUN_SQL}) q"
    ).fetchall()
    assert sorted(r[0] for r in rows) == sorted(e2e_q._MEMBER_SQL)


def test_run_manifest_oracle_shape(con):
    rows = con.execute(e2e_q.RUN_MANIFEST_SQL).fetchall()
    assert len(rows) == 20  # 4 runs x (4 stages + __run__ bookend)
    assert all(r[2] == "done" for r in rows)
    assert all((r[1] == "__run__") == (not r[3]) for r in rows)


def test_history_predicates_are_disjoint_where_required(con):
    """A message can be recoded OR stopped OR moved in commit 2, never
    two of them (one upsert per key per batch), and never also late."""
    q = f"""
    WITH ids AS (SELECT 'msg-' || CAST(event_id AS VARCHAR)
                   AS message_id,
                 CASE event_type WHEN 'purchase' THEN 's01e01'
                      WHEN 'error' THEN 's01e02' ELSE 'other' END
                   AS dataset,
                 ts AS timestamp
                 FROM events)
    SELECT SUM(CASE WHEN ({e2e_q._RECODE}) AND ({e2e_q._STOPPED})
               THEN 1 ELSE 0 END),
           SUM(CASE WHEN (({e2e_q._RECODE}) OR ({e2e_q._STOPPED})
                     OR ({e2e_q._MOVE}) OR ({e2e_q._EMPTIED})
                     OR ({e2e_q._CYCLE}) OR ({e2e_q._HOP2}))
                     AND ({e2e_q._LATE})
               THEN 1 ELSE 0 END),
           SUM(CASE WHEN (({e2e_q._EMPTIED}) OR ({e2e_q._CYCLE})
                     OR ({e2e_q._HOP2})) AND (({e2e_q._DEAD})
                     OR ({e2e_q._RECODE}) OR ({e2e_q._STOPPED})
                     OR ({e2e_q._MOVE}))
               THEN 1 ELSE 0 END),
           SUM(CASE WHEN ({e2e_q._CYCLE}) AND ({e2e_q._HOP2})
               THEN 1 ELSE 0 END),
           SUM(CASE WHEN {e2e_q._RECODE} THEN 1 ELSE 0 END),
           SUM(CASE WHEN {e2e_q._STOPPED} THEN 1 ELSE 0 END),
           SUM(CASE WHEN {e2e_q._MOVE} THEN 1 ELSE 0 END),
           SUM(CASE WHEN {e2e_q._DEAD} THEN 1 ELSE 0 END),
           SUM(CASE WHEN {e2e_q._EMPTIED} THEN 1 ELSE 0 END),
           SUM(CASE WHEN {e2e_q._CYCLE} THEN 1 ELSE 0 END),
           SUM(CASE WHEN {e2e_q._HOP2} THEN 1 ELSE 0 END),
           SUM(CASE WHEN {e2e_q._REVIVED} THEN 1 ELSE 0 END),
           SUM(CASE WHEN ({e2e_q._REVIVED})
                     AND NOT ({e2e_q._DEAD}) THEN 1 ELSE 0 END)
    FROM ids
    """
    (overlap, late_overlap, c4_overlap, ws_overlap, n_rec, n_stop,
     n_move, n_dead, n_emp, n_cyc, n_hop, n_rev,
     rev_not_dead) = con.execute(q).fetchone()
    assert overlap == 0 and late_overlap == 0
    # commit-4 classes never collide with commit-2/3 mutations or each
    # other (one upsert per key per batch; revival is the only class
    # that deliberately overlaps _DEAD — it must be a strict subset)
    assert c4_overlap == 0 and ws_overlap == 0
    assert rev_not_dead == 0 and n_rev < n_dead
    # the history actually exercises every mutation class at this SF
    assert min(n_rec, n_stop, n_move, n_dead, n_emp, n_cyc, n_hop,
               n_rev) > 0
