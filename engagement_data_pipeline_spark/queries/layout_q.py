"""Registry query for the Z-order layout key (sinks/layout.py):
Morton-interleave (user_id, event day) over the events table. The
oracle mirrors the same shift/mask integer arithmetic — every op is
exact, so the hash match certifies the interleave bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.layout import zorder_key
from ..tables import load
from ._helpers import apply_runtime_conf

ZBITS = 10


def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    ev = load(spark, sf_dir, "events")
    # integer division (`div`), not floor(double /): epoch micros sit
    # near the 53-bit double mantissa edge where / can round.
    day = F.expr("unix_micros(ts) div 86400000000")
    return ev.select(
        "event_id",
        zorder_key([F.col("user_id"), day], bits=ZBITS).alias("zkey"))


def _zorder_sql(bits: int = ZBITS) -> str:
    terms = []
    for d, expr in enumerate([
            "(user_id & {mask})",
            "((epoch_us(ts) // 86400000000) & {mask})"]):
        x = expr.format(mask=(1 << bits) - 1)
        for i in range(bits):
            terms.append(f"((({x} >> {i}) & 1) << {i * 2 + d})")
    return ("SELECT event_id, CAST(" + " + ".join(terms)
            + " AS BIGINT) AS zkey FROM events")


EVENTS_ZORDER_KEY_SQL = _zorder_sql()
