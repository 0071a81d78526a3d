"""Registry queries for k-means clustering and semantic near-dup over
`embeddings`, with exact DuckDB oracles that re-run the whole Lloyd
fit in SQL (micro-quantized integer sufficient statistics make the
iterative fit bit-reproducible — training/clustering.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from ..training import clustering as C
from ._helpers import apply_runtime_conf

# Data-dependent knob: the synthetic embeddings have no true
# duplicates, so "near-dup" is pinned at the far tail of the pair-
# cosine distribution (cf. NEAR_DUP_THRESHOLD=0.35 for the LSH
# variant); real corpora use ~0.9+.
SEMANTIC_THRESHOLD = 0.4

_SEED_IN = "(" + ", ".join(str(i) for i in C.KMEANS_SEED_IDS) + ")"

_DOT_VC = ("list_sum(list_transform(generate_series(1, len({v})), "
           "i -> {v}[i] * {c}[i]))")
_NORM_L = "sqrt(list_sum(list_transform({l}, x -> x * x)))"


def _cos(v: str, c: str) -> str:
    return (f"{_DOT_VC.format(v=v, c=c)}"
            f" / ({_NORM_L.format(l=v)} * {_NORM_L.format(l=c)})")


def _fit_ctes(iters: int = C.KMEANS_ITERS) -> str:
    """CTE chain: e, c0, then per-iteration assign/update/coalesce
    (a{i}, s{i}, c{i}) — `c{iters}` is the fitted centroid table."""
    parts = [f"""
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cvec
  FROM e WHERE vec_id IN {_SEED_IN}
)"""]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        parts.append(f"""
a{i} AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos('e.v', 'c.cvec')} DESC, c.cid)
             AS rn
    FROM e CROSS JOIN {prev} c
  ) WHERE rn = 1
),
s{i} AS (
  SELECT a.cluster, t.dim, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t.q) AS BIGINT) AS s
  FROM a{i} a JOIN e USING (vec_id),
       unnest(list_transform(generate_series(1, len(v)),
              i -> {{'dim': CAST(i - 1 AS BIGINT),
                    'q': CAST(floor(v[i] * {float(C.MICRO)!r}) AS BIGINT)}}))
         AS u(t)
  GROUP BY a.cluster, t.dim
),
c{i} AS (
  SELECT c0.cid,
         COALESCE(n.cvec, p.cvec) AS cvec
  FROM c0
  JOIN {prev} p USING (cid)
  LEFT JOIN (
    SELECT cluster AS cid,
           list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * {float(C.MICRO)!r})
                ORDER BY dim) AS cvec
    FROM s{i} GROUP BY cluster
  ) n USING (cid)
)""")
    return "WITH " + ",".join(parts)


# Both registry queries need the spread embeddings and the fitted
# centroid table; memoize both per (session, sf_dir) so the scan +
# spread shuffle happens once and the Lloyd iterations run once
# (applicationId keying, not id(spark) — queries/engagement.py).
_EMB_CACHE: dict[tuple[str, str], DataFrame] = {}
_FIT_CACHE: dict[tuple[str, str], list] = {}


def _spread_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One cached, cluster-wide-spread copy of `embeddings`: every
    pass over the vectors (seed collect, 2 Lloyd iterations, final
    assignment, near-dup probe sides) re-reads the in-memory columnar
    relation instead of re-running scan + repartition per pass —
    5 shuffles and 5 parquet scans become 1 at any scale, and the
    downstream operators' `spread_narrow_scan` sees a wide input and
    adds nothing."""
    key = (spark.sparkContext.applicationId, sf_dir)
    emb = _EMB_CACHE.get(key)
    if emb is None:
        par = spark.sparkContext.defaultParallelism
        emb = load(spark, sf_dir, "embeddings").repartition(par).cache()
        _EMB_CACHE[key] = emb
    return emb


def _fitted(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir)
    cents = _FIT_CACHE.get(key)
    if cents is None:
        cents = C.kmeans_fit(_spread_emb(spark, sf_dir))
        _FIT_CACHE[key] = cents
    return cents


def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    return C.kmeans_assign(_spread_emb(spark, sf_dir),
                           _fitted(spark, sf_dir))


def _kmeans_sql(iters: int = C.KMEANS_ITERS) -> str:
    return _fit_ctes(iters) + f"""
SELECT vec_id, cluster, cosine FROM (
  SELECT e.vec_id, c.cid AS cluster,
         {_cos('e.v', 'c.cvec')} AS cosine,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {_cos('e.v', 'c.cvec')} DESC, c.cid)
           AS rn
  FROM e CROSS JOIN c{iters} c
) WHERE rn = 1
"""


EMB_KMEANS_SQL = _kmeans_sql()


def emb_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    return C.semantic_neardup_pairs(_spread_emb(spark, sf_dir),
                                    _fitted(spark, sf_dir),
                                    threshold=SEMANTIC_THRESHOLD)


def _semantic_sql(iters: int = C.KMEANS_ITERS) -> str:
    return _fit_ctes(iters) + f""",
assigned AS (
  SELECT vec_id, cluster, v FROM (
    SELECT e.vec_id, c.cid AS cluster, e.v,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos('e.v', 'c.cvec')} DESC, c.cid)
             AS rn
    FROM e CROSS JOIN c{iters} c
  ) WHERE rn = 1
)
SELECT * FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
         {_cos('a.v', 'b.v')} AS cosine
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
) WHERE cosine >= {SEMANTIC_THRESHOLD!r}
"""


EMB_SEMANTIC_NEARDUP_SQL = _semantic_sql()
