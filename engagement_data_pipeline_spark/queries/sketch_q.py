"""Registry query for the count-min sketch (operators/stats.py):
heavy-hitter token frequencies estimated from a fixed d*w-cell sketch,
reported side-by-side with the exact counts so the oracle pins both
the sketch cells and the estimator, and the overestimate property
(estimate >= exact, tight for heavy hitters) is visible in the data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.stats import CMS_DEPTH, CMS_WIDTH, cms_estimate, cms_sketch
from ..operators.topk import top_k_rows
from ..tables import load
from ..training.dedup import normalize_text
from ._helpers import apply_runtime_conf

_K = 50


def doc_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    docs = load(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("token"))
    exact = tokens.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"))
    top = top_k_rows(exact, [F.col("n_exact").desc(), F.col("token")], _K)
    sketch = cms_sketch(tokens, "token")
    est = cms_estimate(sketch, top.select("token"), "token")
    return (top.join(est, "token")
            .select("token", "n_exact", "cms_estimate"))


def _cms_sql() -> str:
    def pos(j: int, key: str) -> str:
        return (f"CAST(('0x' || substr(md5('cms{j}:' || {key}), 1, 15)) "
                f"AS BIGINT) % {CMS_WIDTH}")

    cells = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, {pos(j, 'token')} AS pos, "
        f"CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY {pos(j, 'token')}"
        for j in range(CMS_DEPTH))
    probe = " ".join(
        f"WHEN {j} THEN {pos(j, 't.token')}" for j in range(CMS_DEPTH))
    return rf"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
tok AS (SELECT unnest(string_split(norm, ' ')) AS token FROM norm),
cells AS (
{cells}
),
exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_exact
          FROM tok GROUP BY token),
topk AS (SELECT token, n_exact FROM exact
         ORDER BY n_exact DESC, token LIMIT {_K})
SELECT t.token, t.n_exact, MIN(c.c) AS cms_estimate
FROM topk t JOIN cells c
  ON c.pos = (CASE c.j {probe} END)
GROUP BY t.token, t.n_exact
"""


DOC_CMS_HEAVY_HITTERS_SQL = _cms_sql()


# --- Bloom-filter decontamination ----------------------------------------

def doc_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination probe: sketch the TRAIN split's
    shingle hashes once (m/32-word bitmap), then test every eval-doc
    shingle for membership — the constant-memory screen that replaces
    the exact posting join when the train corpus is 100 TB (probe
    positives then go to the exact `doc_contamination` join, which
    here pins the no-false-negative guarantee in-row). Per eval doc:
    (probe_doc_id, n_shingles, n_bloom_hits, n_exact_hits);
    bloom >= exact on every row by construction, and the bitmap
    itself is deterministic (md5 positions) so the oracle checks the
    hit COUNTS exactly, not just the bound."""
    from ..operators.stats import bloom_probe, bloom_sketch
    from ..training.dedup import _shingled

    apply_runtime_conf(spark)
    sh = _shingled(load(spark, sf_dir, "documents"), "text", "doc_id")
    posting = sh.select(F.col("id"), F.explode("h").alias("hash"))
    is_probe = F.col("id") % 100 == 7
    probes = (posting.where(is_probe)
              .select(F.col("id").alias("probe_doc_id"),
                      F.col("hash").cast("string").alias("key")).distinct())
    train_keys = (posting.where(~is_probe)
                  .select(F.col("hash").cast("string").alias("key"))
                  .distinct())
    sketch = bloom_sketch(train_keys, "key")
    hits = bloom_probe(sketch, probes.select("key").distinct(), "key")
    exact = train_keys.withColumn("in_train", F.lit(1))
    return (probes
            .join(hits, "key")
            .join(exact, "key", "left")
            .groupBy("probe_doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shingles"),
                 F.sum(F.col("bloom_hit").cast("long"))
                 .cast("long").alias("n_bloom_hits"),
                 F.sum(F.coalesce(F.col("in_train"), F.lit(0)))
                 .cast("long").alias("n_exact_hits")))


def bloom_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability witness: three partial sketches built over
    doc_id%3 shards of the train split, OR-merged, reported word by
    word against the sketch of the whole split. bits_merged ==
    bits_full on every row (the oracle emits the full sketch twice,
    so any divergence hash-fails) — what makes the bitmap
    incrementally maintainable shard-by-shard at 100 TB."""
    from ..operators.stats import bloom_merge, bloom_sketch
    from ..training.dedup import _shingled

    apply_runtime_conf(spark)
    sh = _shingled(load(spark, sf_dir, "documents"), "text", "doc_id")
    posting = sh.select(F.col("id"), F.explode("h").alias("hash"))
    train = (posting.where(~(F.col("id") % 100 == 7))
             .select(F.col("id"),
                     F.col("hash").cast("string").alias("key")))
    # Round-14 note: two restructurings were tried here (dropping the
    # per-shard distincts on bit_or-idempotence grounds; fusing the
    # three shard sketches into one cached (word, shard) aggregation)
    # and BOTH measured slower on the first-call cost the bench pays
    # (the distinct's dedup shrinks the BLOOM_HASHES-way explode
    # severalfold, and the fused pass's cache materialization costs
    # more than the per-shard pipelines it saves at this shard
    # count). Kept as-is deliberately — see OPTIMIZATION_r14.md.
    shards = [train.where(F.col("id") % 3 == i).select("key").distinct()
              for i in range(3)]
    merged = bloom_merge([bloom_sketch(s, "key") for s in shards])
    full = bloom_sketch(train.select("key").distinct(), "key")
    return (merged.withColumnRenamed("bits", "bits_merged")
            .join(full.withColumnRenamed("bits", "bits_full"), "word")
            .select("word", "bits_merged", "bits_full"))


def _bloom_sql() -> str:
    from ..operators.stats import BLOOM_BITS, BLOOM_HASHES, BLOOM_WORD_BITS
    from .training import _SHINGLES_CTE

    def pos(j: int, key: str) -> str:
        return (f"(CAST(('0x' || substr(md5('bf{j}:' || {key}), 1, 15)) "
                f"AS BIGINT) % {BLOOM_BITS})")

    pos_list = ", ".join(pos(j, "key") for j in range(BLOOM_HASHES))
    base = "WITH " + _SHINGLES_CTE + f""",
hashed AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
      shingles, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))) AS hash
  FROM sh
),
train AS (
  SELECT DISTINCT CAST(hash AS VARCHAR) AS key
  FROM hashed WHERE doc_id % 100 <> 7
),
cells AS (
  SELECT pos // {BLOOM_WORD_BITS} AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % {BLOOM_WORD_BITS} AS INT))
           AS bits
  FROM (SELECT unnest([{pos_list}]) AS pos FROM train)
  GROUP BY 1
)"""
    return base


def _bloom_contamination_sql() -> str:
    from ..operators.stats import BLOOM_BITS, BLOOM_HASHES, BLOOM_WORD_BITS

    def pos(j: int, key: str) -> str:
        return (f"(CAST(('0x' || substr(md5('bf{j}:' || {key}), 1, 15)) "
                f"AS BIGINT) % {BLOOM_BITS})")

    probe_cells = ", ".join(
        f"{{'j': {j}, 'pos': {pos(j, 'key')}}}" for j in range(BLOOM_HASHES))
    return _bloom_sql() + f""",
probes AS (
  SELECT DISTINCT doc_id AS probe_doc_id, CAST(hash AS VARCHAR) AS key
  FROM hashed WHERE doc_id % 100 = 7
),
probe_keys AS (SELECT DISTINCT key FROM probes),
probe_bits AS (
  SELECT key, s.pos // {BLOOM_WORD_BITS} AS word,
         CAST(1 AS BIGINT) << CAST(s.pos % {BLOOM_WORD_BITS} AS INT) AS mask
  FROM (SELECT key, unnest([{probe_cells}]) AS s FROM probe_keys)
),
hit AS (
  SELECT pb.key,
         (MIN(CASE WHEN (COALESCE(c.bits, 0) & pb.mask) <> 0
                   THEN 1 ELSE 0 END) = 1) AS bloom_hit
  FROM probe_bits pb LEFT JOIN cells c USING (word)
  GROUP BY pb.key
)
SELECT p.probe_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN h.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_hits,
       CAST(SUM(CASE WHEN t.key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_hits
FROM probes p
JOIN hit h USING (key)
LEFT JOIN train t USING (key)
GROUP BY p.probe_doc_id
"""


def _bloom_merge_sql() -> str:
    return _bloom_sql() + """
SELECT word, bits AS bits_merged, bits AS bits_full FROM cells
"""


DOC_BLOOM_CONTAMINATION_SQL = _bloom_contamination_sql()
BLOOM_STATE_MERGE_SQL = _bloom_merge_sql()
