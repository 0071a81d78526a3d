"""Measured shared-slice evidence for `refresh_views`: advancing the
co-maintained G1 + G2 view pair with ONE touched_group_slice
derivation vs two independent refreshes, appended to
SCALE_EVIDENCE.md.

The slice derivation (change-feed diff, pre-change snapshot semi-join,
touched-set checkpoint) is the per-sync cost that does NOT depend on
which view consumes it; the folds themselves are view-specific. Both
strategies are run against identical table histories (two view pairs
over one source) and their final states asserted identical.

Run: python tools/views_shared_stress.py [out_md]  (default SCALE_EVIDENCE.md)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _stress_common import (BASE_PARTICIPANTS, FACTORS,  # noqa: E402
                            MSGS_PER_PARTICIPANT, recode_m5,
                            stress_session, synthetic_imputed)


def main() -> None:
    from pyspark.sql import functions as F

    from engagement_data_pipeline_spark.labels.config import (
        SYNTHETIC_CONFIG)
    from engagement_data_pipeline_spark.labels.views import (
        build_messages_view, build_participants_view,
        refresh_messages_view, refresh_participants_view,
        refresh_views)
    from engagement_data_pipeline_spark.streaming import ingest as ing

    out_md = sys.argv[1] if len(sys.argv) > 1 else "SCALE_EVIDENCE.md"
    spark = stress_session("views-shared-stress")

    rows_out = []
    for factor in FACTORS:
        parts = BASE_PARTICIPANTS * factor
        n = parts * MSGS_PER_PARTICIPANT
        root = tempfile.mkdtemp(prefix="edp-vshared-")
        base = os.path.join(root, "t")
        rows = synthetic_imputed(spark, parts, n)
        merge = ing.foreach_batch_upsert(base, ["message_id"],
                                         n_buckets=8 * factor,
                                         bucket_cols=["participant_uuid"],
                                         txn_app_id="src",
                                         mode="latest_wins")
        merge(rows, 1)
        views = {}
        for tag in ("ind", "sh"):
            views[tag] = (os.path.join(root, f"pv_{tag}"),
                          os.path.join(root, f"mv_{tag}"))
            build_participants_view(spark, base, views[tag][0],
                                    SYNTHETIC_CONFIG,
                                    n_buckets=8 * factor)
            build_messages_view(spark, base, views[tag][1],
                                SYNTHETIC_CONFIG, n_buckets=8 * factor)
        merge(recode_m5(rows), 2)

        pv, mv = views["ind"]
        t0 = time.perf_counter()
        assert refresh_participants_view(spark, base, pv,
                                         SYNTHETIC_CONFIG) == 2
        assert refresh_messages_view(spark, base, mv,
                                     SYNTHETIC_CONFIG) == 2
        t_ind = time.perf_counter() - t0

        pv, mv = views["sh"]
        t0 = time.perf_counter()
        got = refresh_views(spark, base, pv, mv, SYNTHETIC_CONFIG)
        t_sh = time.perf_counter() - t0
        assert got == {"participants": 2, "messages": 2}, got

        # content equality, not just cardinality: an order-insensitive
        # checksum over every column catches a refresh that folded
        # nothing (the only mutation is a recode, which keeps counts)
        def _fingerprint(path):
            df = ing.read_merged_table(spark, path)
            h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"),
                                        F.lit("\x00")) for c in
                             sorted(df.columns)])
            return tuple(df.agg(F.count(F.lit(1)),
                                F.sum(h.cast("decimal(38,0)"))).first())

        for i in (0, 1):
            a = _fingerprint(views["ind"][i])
            b = _fingerprint(views["sh"][i])
            assert a == b, (i, a, b)

        rows_out.append((factor, n, round(t_ind, 2), round(t_sh, 2),
                         round(t_ind / t_sh, 2)))
        print(f"x{factor}: rows={n} independent={t_ind:.2f}s "
              f"shared={t_sh:.2f}s ratio={t_ind / t_sh:.2f}",
              flush=True)

    with open(out_md, "a") as f:
        f.write("\n## Shared-slice view refresh: refresh_views (G1+G2,"
                " one feed diff) vs independent refreshes (measured; "
                "1 recoded message, clustered on participant)\n\n")
        f.write("| factor | table_rows | independent_seconds | "
                "shared_seconds | independent/shared |\n"
                "|---|---|---|---|---|\n")
        for r in rows_out:
            f.write("| x{} | {} | {} | {} | {}x |\n".format(*r))
        f.write("\nReading: the slice derivation (feed diff, "
                "pre-change snapshot semi-join, touched-set "
                "checkpoint) runs once instead of once per view; the "
                "folds and merge-writes are view-specific and remain. "
                "Final view states are asserted identical between "
                "strategies at every factor.\n")
    spark.stop()


if __name__ == "__main__":
    main()
