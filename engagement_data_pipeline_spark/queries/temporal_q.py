"""Registry queries for the temporal operators (operators/temporal.py)
plus time-rollup and funnel analytics over the events table.

Reference analogs: the pipeline's episode logic slices engagement by
configured time ranges (F5) and analyses traffic per-period (A7,
`analysis/traffic.py` in the reference); an engine serving the same
users at 100 TB also needs point-in-time joins (as-of), bounded
event-window correlation (range join), multi-resolution rollups and
step funnels. All four queries are pure DataFrame compositions —
no UDFs, every expression codegen-friendly.

Cross-engine exactness: timestamps exported as unix_micros; counts
are BIGINT; rollup subtotal rows are disambiguated by coalescing to
sentinels (-1 / '<all>') rather than engine-specific GROUPING_ID.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join
from ._helpers import micros, t

_RANGE_WINDOW_S = 600  # clicks within 10 min before a purchase

# --- as-of join: each purchase -> most recent click ----------------------


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correlate: for every purchase event, the user's
    most recent click at-or-before it. Right side is deduped to one
    row per (user, ts) (max event_id) so the carried row is
    deterministic. Plans as ONE window pass over a tagged union —
    no join operator, shuffle volume |purchases|+|clicks|."""
    ev = t(spark, sf_dir, "events")
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (ev.where(F.col("event_type") == "click")
              .groupBy("user_id", F.col("ts").alias("click_ts"))
              .agg(F.max("event_id").alias("click_event_id")))
    out = asof_join(purchases, clicks, on=["user_id"],
                    left_ts="ts", right_ts="click_ts",
                    right_cols=["click_event_id"])
    return out.select(
        "event_id", "user_id", micros("ts").alias("ts_us"),
        micros("click_ts").alias("click_ts_us"),
        F.col("click_event_id").cast("long").alias("click_event_id"))


EVENTS_ASOF_JOIN_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts AS click_ts, MAX(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       epoch_us(c.click_ts) AS click_ts_us,
       CAST(c.click_event_id AS BIGINT) AS click_event_id
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.click_ts
"""


# --- bounded range join: clicks within 10 min before each purchase -------


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-window correlation: every (purchase, click) pair of the
    same user with the click in the 10 minutes before the purchase.
    Bucketed equi-join (operators/temporal.py:range_join) — candidate
    set bounded per (user, bucket), never a cartesian plan."""
    ev = t(spark, sf_dir, "events")
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         "user_id", F.col("ts").alias("purchase_ts")))
    clicks = (ev.where(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      "user_id", F.col("ts").alias("click_ts")))
    pairs = range_join(purchases, clicks, on=["user_id"],
                       left_ts="purchase_ts", right_ts="click_ts",
                       window_seconds=_RANGE_WINDOW_S)
    return pairs.select(
        "user_id", "purchase_id", "click_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
        .alias("delta_us"))


EVENTS_RANGE_JOIN_SQL = f"""
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND {_RANGE_WINDOW_S * 1_000_000}
"""


# --- multi-resolution rollup --------------------------------------------


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: event counts and distinct users at
    (day, type), (day), and grand-total resolutions in one pass.
    Spark computes all three grouping sets with a single shuffle
    (Expand + one hash aggregate); subtotal rows are marked with
    sentinels so both engines hash identically."""
    ev = t(spark, sf_dir, "events").select(
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"),
        "event_type", "user_id")
    rolled = ev.rollup("day_us", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"))
    return rolled.select(
        F.coalesce("day_us", F.lit(-1)).alias("day_us"),
        F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
        "n_events", "n_users")


EVENTS_ROLLUP_SQL = """
SELECT COALESCE(day_us, -1) AS day_us,
       COALESCE(event_type, '<all>') AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM (SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type, user_id
      FROM events)
GROUP BY ROLLUP(day_us, event_type)
"""


# --- step funnel ---------------------------------------------------------

_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> view -> click -> purchase:
    users counted at step k only if step k happened strictly after
    their step k-1. Chained min-over-user windows share ONE exchange
    (same partitioning, no ordering needed); the final shape is 4
    rows. No self-joins, no collect_list blow-up."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    step = ev
    prev: str | None = None
    for i, name in enumerate(_FUNNEL_STEPS):
        cond = F.col("event_type") == name
        if prev is not None:
            cond = cond & (F.col("ts") > F.col(prev))
        step = step.withColumn(f"t{i}",
                               F.min(F.when(cond, F.col("ts"))).over(w))
        prev = f"t{i}"
    per_user = step.groupBy("user_id").agg(
        *[F.max(f"t{i}").alias(f"t{i}") for i in range(len(_FUNNEL_STEPS))])
    counts = per_user.select(
        *[F.count(f"t{i}").cast("long").alias(f"n{i}")
          for i in range(len(_FUNNEL_STEPS))])
    stack_expr = ", ".join(
        f"{i}, '{name}', n{i}" for i, name in enumerate(_FUNNEL_STEPS))
    return counts.selectExpr(
        f"stack({len(_FUNNEL_STEPS)}, {stack_expr}) "
        "AS (step_idx, step, n_users)").select(
        F.col("step_idx").cast("int").alias("step_idx"),
        "step", F.col("n_users").cast("long").alias("n_users"))


def _funnel_sql() -> str:
    sel, src = "user_id, event_type, ts", "events"
    for i, name in enumerate(_FUNNEL_STEPS):
        cond = f"event_type = '{name}'"
        if i > 0:
            cond += f" AND ts > t{i - 1}"
        sel += (f", MIN(CASE WHEN {cond} THEN ts END) "
                f"OVER (PARTITION BY user_id) AS t{i}")
        src = f"(SELECT {sel} FROM {src})"
        sel = "user_id, event_type, ts" + "".join(
            f", t{j}" for j in range(i + 1))
    cols = ", ".join(f"COUNT(DISTINCT CASE WHEN t{i} IS NOT NULL "
                     f"THEN user_id END) AS n{i}"
                     for i in range(len(_FUNNEL_STEPS)))
    rows = " UNION ALL ".join(
        f"SELECT {i} AS step_idx, '{name}' AS step, "
        f"CAST(n{i} AS BIGINT) AS n_users FROM counts"
        for i, name in enumerate(_FUNNEL_STEPS))
    return f"WITH counts AS (SELECT {cols} FROM {src}) {rows}"


EVENTS_FUNNEL_SQL = _funnel_sql()


# --- cohort retention ----------------------------------------------------


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day,
    distinct active users per (cohort, day-offset). Two aggregations
    hashed on the user key (first-day min, then distinct activity) —
    the window min and the distinct-day grain reuse one user-keyed
    exchange; final matrix is tiny."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day"))
    w = Window.partitionBy("user_id")
    marked = ev.withColumn("cohort_day", F.min("day").over(w))
    return (marked
            .select("user_id", "cohort_day",
                    F.datediff(F.col("day"), F.col("cohort_day"))
                    .cast("int").alias("offset_days"))
            .distinct()
            .groupBy(micros("cohort_day").alias("cohort_day_us"),
                     "offset_days")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users")))


EVENTS_RETENTION_SQL = """
WITH marked AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         MIN(date_trunc('day', ts)) OVER (PARTITION BY user_id) AS cohort_day
  FROM events
),
dedup AS (
  SELECT DISTINCT user_id, cohort_day,
         CAST(date_diff('day', cohort_day, day) AS INTEGER) AS offset_days
  FROM marked
)
SELECT epoch_us(cohort_day) AS cohort_day_us, offset_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM dedup GROUP BY epoch_us(cohort_day), offset_days
"""


# --- trailing-window rollup (RANGE frames) -------------------------------

_TRAIL_DAYS = 7
_DAY_US = 86_400 * 1_000_000


def events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day): daily event count plus the trailing
    7-day count and distinct-user reach, via a RANGE window frame
    over the daily pre-aggregate (not the raw events — the window
    input is |types| x |days| rows, so the sort inside each type
    partition is trivial at any corpus size; the heavy lifting stays
    in the one hash aggregation below it)."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"),
        "user_id")
    daily = ev.groupBy("event_type", "day_us").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"))
    w = (Window.partitionBy("event_type").orderBy("day_us")
         .rangeBetween(-(_TRAIL_DAYS - 1) * _DAY_US, 0))
    return daily.select(
        "event_type", "day_us", "n_events",
        F.sum("n_events").over(w).cast("long").alias("trailing_events"),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_days"))


EVENTS_ROLLING_SQL = f"""
WITH daily AS (
  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, epoch_us(date_trunc('day', ts))
)
SELECT event_type, day_us, n_events,
       CAST(SUM(n_events) OVER w AS BIGINT) AS trailing_events,
       CAST(COUNT(*) OVER w AS BIGINT) AS trailing_days
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day_us
             RANGE BETWEEN {(_TRAIL_DAYS - 1) * _DAY_US} PRECEDING
                       AND CURRENT ROW)
"""


def events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic anomaly detection: flag (event_type, day) cells whose
    daily count deviates from the trailing-week baseline by more than
    2σ. The monitoring query a pipeline operator runs over ingest
    volumes (the reference eyeballs its A7 traffic export; this is
    the alerting form).

    Exactness: the baseline window carries INTEGER sums (Σc, Σc²), so
    the 2σ test is the integer inequality
    (n·c − S)² > 4·(n·Q − S²) — no float compare at the decision
    boundary; the reported z uses sqrt, which IEEE requires correctly
    rounded, over exact-integer-derived doubles, so both engines agree
    bitwise. Shape: one hash aggregation to daily grain, then a
    window over |types|×|days| rows — trivial at any corpus size."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"))
    daily = ev.groupBy("event_type", "day_us").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    w = (Window.partitionBy("event_type").orderBy("day_us")
         .rangeBetween(-7 * _DAY_US, -_DAY_US))
    base = daily.select(
        "event_type", "day_us", "c",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("c").over(w).cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("long").alias("q"))
    base = base.where(F.col("n") >= 3)
    dev = F.col("n") * F.col("c") - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")  # n²·var
    z = F.when(
        var_n2 > 0,
        dev.cast("double") / F.sqrt(var_n2.cast("double"))
    ).otherwise(F.lit(None).cast("double"))
    return base.select(
        "event_type", "day_us", F.col("c").alias("n_events"),
        F.col("n").alias("baseline_days"),
        (F.col("s").cast("double") / F.col("n").cast("double"))
        .alias("baseline_mean"),
        z.alias("z"),
        (dev * dev > F.lit(4) * var_n2).alias("is_anomaly"))


EVENTS_ANOMALY_DAYS_SQL = f"""
WITH daily AS (
  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT event_type, day_us, c,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(c) OVER w AS BIGINT) AS s,
         CAST(SUM(c * c) OVER w AS BIGINT) AS q
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_us
               RANGE BETWEEN {7 * _DAY_US} PRECEDING
                         AND {_DAY_US} PRECEDING)
)
SELECT event_type, day_us, c AS n_events,
       n AS baseline_days,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS baseline_mean,
       CASE WHEN n * q - s * s > 0
            THEN CAST(n * c - s AS DOUBLE)
                 / sqrt(CAST(n * q - s * s AS DOUBLE))
            ELSE NULL END AS z,
       (n * c - s) * (n * c - s) > 4 * (n * q - s * s) AS is_anomaly
FROM base WHERE n >= 3
"""


# --- time-series gap filling ---------------------------------------------

def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per event type: missing days between each
    type's first and last activity materialize with n_events = 0,
    then a cumulative total runs over the dense axis — the
    gap-filling step every downstream charting/anomaly consumer
    needs (a trailing window over a sparse axis silently shortens
    its horizon on quiet days).

    Shape: one hash aggregation to daily grain, a per-type min/max
    regroup (|types| rows) exploded into the dense day axis via
    `sequence` (zero shuffle — the axis is tiny), one broadcast-ready
    left join of the daily counts back onto it, one window. Every
    post-aggregate structure is |types| x |days| rows regardless of
    corpus size."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"))
    daily = ev.groupBy("event_type", "day_us").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"))
    axis = (daily.groupBy("event_type")
            .agg(F.min("day_us").alias("lo"), F.max("day_us").alias("hi"))
            .select("event_type",
                    F.explode(F.sequence(F.col("lo"), F.col("hi"),
                                         F.lit(_DAY_US))).alias("day_us")))
    dense = (axis.join(daily, ["event_type", "day_us"], "left")
             .select("event_type", "day_us",
                     F.coalesce("n_events", F.lit(0)).cast("long")
                     .alias("n_events")))
    w = Window.partitionBy("event_type").orderBy("day_us") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return dense.select(
        "event_type", "day_us", "n_events",
        F.sum("n_events").over(w).cast("long").alias("cum_events"))


EVENTS_GAPFILL_SQL = f"""
WITH daily AS (
  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, epoch_us(date_trunc('day', ts))
),
axis AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, {_DAY_US})) AS day_us
  FROM (SELECT event_type, MIN(day_us) AS lo, MAX(day_us) AS hi
        FROM daily GROUP BY event_type)
),
dense AS (
  SELECT a.event_type, a.day_us,
         CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events
  FROM axis a LEFT JOIN daily d USING (event_type, day_us)
)
SELECT event_type, day_us, n_events,
       CAST(SUM(n_events) OVER (
           PARTITION BY event_type ORDER BY day_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_events
FROM dense
"""


# --- semi-structured JSON extraction --------------------------------------

def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the JSON `props` column: `from_json` with
    an explicit schema (vectorized JVM parse — never a Python UDF),
    then a per-type rollup of the extracted field. Malformed rows
    parse to NULL and are counted rather than dropped, which is the
    ingest posture a 100 TB semi-structured column needs."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("k").cast("long").alias("n_parsed"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("int").alias("min_k"),
        F.max("k").cast("int").alias("max_k"))


EVENTS_JSON_PROPS_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(k) AS BIGINT) AS n_parsed,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS INTEGER) AS min_k,
       CAST(MAX(k) AS INTEGER) AS max_k
FROM (SELECT event_type,
             CAST(props ->> '$.k' AS INTEGER) AS k
      FROM events)
GROUP BY event_type
"""


# --- pivot (wide daily matrix) --------------------------------------------

_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily wide matrix: one column per event type via the relational
    pivot. The value list is supplied explicitly, so Spark skips the
    extra distinct-values job and the plan is a single hash
    aggregation with one row per day — the A5 cross-tab generalized
    to the pivot API surface."""
    ev = t(spark, sf_dir, "events").select(
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"),
        "event_type")
    wide = (ev.groupBy("day_us")
            .pivot("event_type", _PIVOT_TYPES)
            .agg(F.count(F.lit(1)))
            .na.fill(0))
    for ty in _PIVOT_TYPES:
        wide = wide.withColumn(f"n_{ty}", F.col(ty).cast("long")) \
                   .drop(ty)
    return wide


EVENTS_PIVOT_SQL = """
SELECT epoch_us(date_trunc('day', ts)) AS day_us,
""" + ",\n".join(
    f"       CAST(COUNT(*) FILTER (WHERE event_type = '{ty}') AS BIGINT)"
    f" AS n_{ty}" for ty in _PIVOT_TYPES
) + """
FROM events GROUP BY epoch_us(date_trunc('day', ts))
"""


# --- multi-touch attribution ----------------------------------------------

def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value splits
    across every click by the same user in the 10 minutes before it
    (the certified bucketed range join), integer-exactly — cents are
    divided with the remainder going to the EARLIEST touches (largest-
    remainder rule), so credited cents sum exactly to the purchase
    and the whole computation is bit-reproducible. Output: credited
    cents + touch counts per click day. Post-join structures are one
    window over the (tiny) pair set + one hash aggregation."""
    ev = t(spark, sf_dir, "events")
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         "user_id", F.col("ts").alias("purchase_ts"),
                         F.round(F.col("value") * 100).cast("long")
                         .alias("cents")))
    clicks = (ev.where(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"), "user_id",
                      F.col("ts").alias("click_ts")))
    pairs = range_join(purchases, clicks, on=["user_id"],
                       left_ts="purchase_ts", right_ts="click_ts",
                       window_seconds=_RANGE_WINDOW_S)
    wp = Window.partitionBy("purchase_id")
    wr = Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    credited = pairs.select(
        "click_ts", "cents",
        F.count(F.lit(1)).over(wp).alias("n_touch"),
        F.row_number().over(wr).alias("touch_rank"))
    credit = (F.expr("cents div n_touch")
              + F.when(F.col("touch_rank") <= F.col("cents") % F.col("n_touch"),
                       F.lit(1)).otherwise(F.lit(0)))
    return (credited
            .select(F.unix_micros(F.date_trunc("day", F.col("click_ts")))
                    .alias("day_us"), credit.alias("credit_cents"))
            .groupBy("day_us")
            .agg(F.count(F.lit(1)).cast("long").alias("n_credited_touches"),
                 F.sum("credit_cents").cast("long").alias("credited_cents")))


EVENTS_ATTRIBUTION_SQL = f"""
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
pairs AS (
  SELECT p.purchase_id, p.cents, c.click_ts, c.click_id
  FROM purchases p JOIN clicks c ON p.user_id = c.user_id
  WHERE epoch_us(p.purchase_ts) - epoch_us(c.click_ts)
        BETWEEN 0 AND {_RANGE_WINDOW_S} * 1000000
),
credited AS (
  SELECT click_ts, cents,
         COUNT(*) OVER (PARTITION BY purchase_id) AS n_touch,
         ROW_NUMBER() OVER (PARTITION BY purchase_id
                            ORDER BY click_ts, click_id) AS touch_rank
  FROM pairs
)
SELECT epoch_us(date_trunc('day', click_ts)) AS day_us,
       CAST(COUNT(*) AS BIGINT) AS n_credited_touches,
       CAST(SUM(cents // n_touch
                + CASE WHEN touch_rank <= cents % n_touch
                       THEN 1 ELSE 0 END) AS BIGINT) AS credited_cents
FROM credited GROUP BY epoch_us(date_trunc('day', click_ts))
"""


# --- weekly top spenders ---------------------------------------------------

_WEEKLY_K = 3


def events_weekly_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 purchasing users per ISO week by cents spent (integer-
    exact money, total order by cents desc then user) — the grouped
    top-k shape over a time bucket: one hash aggregation + one
    bounded window per week partition."""
    from ..operators.topk import top_k_per_group

    ev = t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    weekly = (ev.select(
        F.unix_micros(F.date_trunc("week", F.col("ts"))).alias("week_us"),
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
        .groupBy("week_us", "user_id")
        .agg(F.sum("cents").cast("long").alias("cents"),
             F.count(F.lit(1)).cast("long").alias("n_purchases")))
    return top_k_per_group(weekly, ["week_us"],
                           [F.col("cents").desc(), F.col("user_id")],
                           _WEEKLY_K, rank_col="rank")


EVENTS_WEEKLY_TOPK_SQL = f"""
WITH weekly AS (
  SELECT epoch_us(date_trunc('week', ts)) AS week_us, user_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase'
  GROUP BY epoch_us(date_trunc('week', ts)), user_id
)
SELECT * FROM (
  SELECT week_us, user_id, cents, n_purchases,
         ROW_NUMBER() OVER (PARTITION BY week_us
                            ORDER BY cents DESC, user_id) AS rank
  FROM weekly
) WHERE rank <= {_WEEKLY_K}
"""


# --- cumulative user growth ------------------------------------------------

def events_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over time WITHOUT a distinct-
    accumulating window (quadratic at scale): each user contributes
    once at their first-seen day, so the growth curve is daily new
    users + one running sum over the tiny daily axis."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us"))
    first_seen = ev.groupBy("user_id").agg(F.min("day_us").alias("day_us"))
    daily = first_seen.groupBy("day_us").agg(
        F.count(F.lit(1)).cast("long").alias("new_users"))
    w = Window.orderBy("day_us").rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)
    return daily.select(
        "day_us", "new_users",
        F.sum("new_users").over(w).cast("long").alias("total_users"))


EVENTS_USER_GROWTH_SQL = """
WITH first_seen AS (
  SELECT user_id, MIN(epoch_us(date_trunc('day', ts))) AS day_us
  FROM events GROUP BY user_id
),
daily AS (
  SELECT day_us, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY day_us
)
SELECT day_us, new_users,
       CAST(SUM(new_users) OVER (
           ORDER BY day_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS total_users
FROM daily
"""
