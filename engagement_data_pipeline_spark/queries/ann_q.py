"""Registry queries for the PERSISTED IVF ANN index
(training/ann_index.py): the indexed read path, the trained
quantizer, the stream-maintained twin, and the seeded-vs-trained
recall eval. All oracles are exact value-hash DuckDB mirrors — the
index changes WHERE the bytes are read from, never the arithmetic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import ingest as ing
from ..training import ann_index as AI
from ..training import clustering as C
from ..training import similarity as S
from ..tables import load
from . import clustering_q
from ._helpers import apply_runtime_conf, fixture_dir
from .similarity import (ANN_TOPK_BRUTEFORCE_SQL, ANN_TOPK_IVF_SQL, K,
                         QUERY_IDS, _CENT_IN, _cosine_sql, _eval_block)

_Q_IN = "(" + ", ".join(str(i) for i in QUERY_IDS) + ")"


def _queries_df(emb: DataFrame, ids=QUERY_IDS) -> DataFrame:
    return (emb.where(F.col("vec_id").isin(list(ids)))
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q_emb")))


# --- indexed IVF == direct IVF (same quantizer, same oracle) ---------------

def _seed_index_fixture(spark: SparkSession, sf_dir: str) -> str:
    def _build(path: str) -> None:
        emb = load(spark, sf_dir, "embeddings")
        AI.build_ann_index(spark, emb, os.path.join(path, "index"),
                           S.seed_centroids_ivf(emb))

    return os.path.join(fixture_dir("ann_seed_index", sf_dir, _build),
                        "index")


def ann_topk_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over the PERSISTED index: the corpus-wide cell
    assignment was paid once at build; the query ranks probe cells
    driver-side against the stored quantizer and reads ONLY the
    probed cells' buckets. Shares `ANN_TOPK_IVF_SQL` with the
    per-query-assignment `ann_topk_ivf` — the oracle match proves the
    index changes the read path, not the answer."""
    apply_runtime_conf(spark)
    idx = _seed_index_fixture(spark, sf_dir)
    q = _queries_df(load(spark, sf_dir, "embeddings"))
    return AI.ann_topk_indexed(spark, idx, q, K, n_probe=S.IVF_NPROBE)


ANN_TOPK_IVF_INDEXED_SQL = ANN_TOPK_IVF_SQL


# --- trained quantizer through the index -----------------------------------

def _trained_index_fixture(spark: SparkSession, sf_dir: str) -> str:
    def _build(path: str) -> None:
        emb = load(spark, sf_dir, "embeddings")
        AI.build_ann_index(spark, emb, os.path.join(path, "index"),
                           clustering_q._fitted(spark, sf_dir))

    return os.path.join(fixture_dir("ann_trained_index", sf_dir, _build),
                        "index")


def ann_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with the TRAINED coarse quantizer (`kmeans_fit`, 2
    Lloyd iterations — bit-reproducible via micro-quantized sufficient
    statistics) stored in and served from the persisted index. The
    oracle re-runs the whole fit in SQL (clustering_q._fit_ctes) and
    probes/scores with the fitted table — an exact value hash across
    an ITERATIVELY TRAINED index."""
    apply_runtime_conf(spark)
    idx = _trained_index_fixture(spark, sf_dir)
    q = _queries_df(load(spark, sf_dir, "embeddings"))
    return AI.ann_topk_indexed(spark, idx, q, K, n_probe=S.IVF_NPROBE)


def _ivf_from_fit_sql(iters: int, n_probe: int = S.IVF_NPROBE,
                      k: int = K) -> str:
    """IVF query SQL whose centroid table is `c{iters}` of the k-means
    CTE chain (iters=0 → the raw seeds, the untrained quantizer)."""
    ct = f"c{iters}"
    cosvc = clustering_q._cos("e.v", "c.cvec")
    return clustering_q._fit_ctes(iters) + f""",
assigned AS (
  SELECT vec_id, v, cid AS cell FROM (
    SELECT e.vec_id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {cosvc} DESC, c.cid) AS crn
    FROM e CROSS JOIN {ct} c
  ) WHERE crn = 1
),
qprobe AS (
  SELECT query_id, q_v, cell FROM (
    SELECT e.vec_id AS query_id, e.v AS q_v, c.cid AS cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {cosvc} DESC, c.cid) AS crn
    FROM e CROSS JOIN {ct} c
    WHERE e.vec_id IN {_Q_IN}
  ) WHERE crn <= {n_probe}
),
scored AS (
  SELECT q.query_id, a.vec_id,
         {clustering_q._cos("a.v", "q.q_v")} AS cosine
  FROM assigned a JOIN qprobe q USING (cell)
  WHERE a.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


ANN_TOPK_IVF_TRAINED_SQL = _ivf_from_fit_sql(C.KMEANS_ITERS)


# --- stream-maintained index (insert/update/delete history) ----------------
#
# Deterministic history over `embeddings`:
#   commit 1: vec_id % 5 != 4                      (the base corpus)
#   commit 2: vec_id % 7 == 3 (in base) -> embedding reversed (update)
#             vec_id % 5 == 4           -> inserted late
#   commit 3: vec_id % 11 == 5 & untouched above -> deleted (dv)
# QUERY_IDS cover all paths: 3 is updated, 4 is late-inserted.

def _stream_index_fixture(spark: SparkSession, sf_dir: str) -> str:
    def _build(path: str) -> None:
        from ..streaming.drain import drain_changes

        src = os.path.join(path, "src")
        emb = load(spark, sf_dir, "embeddings").select(
            F.col("vec_id").cast("string").alias("vec_id"), "embedding")
        vid = F.col("vec_id").cast("long")
        merge = ing.foreach_batch_upsert(src, ["vec_id"], n_buckets=8,
                                         txn_app_id="fixture",
                                         mode="latest_wins")
        merge(emb.where(vid % 5 != 4), 1)
        upd = (emb.where((vid % 7 == 3) & (vid % 5 != 4))
               .withColumn("embedding", F.reverse(F.col("embedding"))))
        merge(upd.unionByName(emb.where(vid % 5 == 4)), 2)
        ing.delete_origins(
            spark, src,
            emb.where((vid % 11 == 5) & (vid % 7 != 3) & (vid % 5 != 4))
            .select("vec_id"),
            strategy="dv")
        cents = S.seed_centroids_ivf(load(spark, sf_dir, "embeddings"))
        drain_changes(spark, src,
                      AI.ann_index_stream_sink(os.path.join(path, "ann"),
                                               cents))

    return fixture_dir("ann_stream_index", sf_dir, _build)


def ann_ivf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over an index maintained PUSH-BASED from the corpus
    table's retract stream across an insert / embedding-update /
    delete history — updates retract the OLD cell's posting (old cell
    derived from the feed's ``embedding__old``, zero source reads) and
    insert the new one. The oracle recomputes the final corpus state
    and the full IVF answer from scratch; a hash match proves the
    maintained index == a rebuild."""
    apply_runtime_conf(spark)
    base = _stream_index_fixture(spark, sf_dir)
    src = os.path.join(base, "src")
    idx = os.path.join(base, "ann")
    qdf = (ing.read_merged_table(spark, src)
           .where(F.col("vec_id").cast("long").isin(list(QUERY_IDS)))
           .select(F.col("vec_id").cast("long").alias("query_id"),
                   F.col("embedding").alias("q_emb")))
    return AI.ann_topk_indexed(spark, idx, qdf, K, n_probe=S.IVF_NPROBE)


def _ivf_stream_sql() -> str:
    cos_cent = _cosine_sql("e.embedding", "c.c_emb")
    return f"""
WITH fin AS (
  SELECT vec_id,
         CASE WHEN vec_id % 7 = 3 AND vec_id % 5 <> 4
              THEN list_reverse(embedding) ELSE embedding END AS embedding
  FROM embeddings
  WHERE NOT (vec_id % 11 = 5 AND vec_id % 7 <> 3 AND vec_id % 5 <> 4)
),
cents AS (
  SELECT vec_id AS cid, embedding AS c_emb FROM embeddings
  WHERE vec_id IN {_CENT_IN}
),
assigned AS (
  SELECT vec_id, emb, cid AS cell FROM (
    SELECT e.vec_id, e.embedding AS emb, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos_cent} DESC, c.cid) AS crn
    FROM fin e CROSS JOIN cents c
  ) WHERE crn = 1
),
qprobe AS (
  SELECT query_id, q_emb, cid AS cell FROM (
    SELECT e.vec_id AS query_id, e.embedding AS q_emb, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos_cent} DESC, c.cid) AS crn
    FROM fin e CROSS JOIN cents c
    WHERE e.vec_id IN {_Q_IN}
  ) WHERE crn <= {S.IVF_NPROBE}
),
scored AS (
  SELECT q.query_id, a.vec_id,
         {_cosine_sql("a.emb", "q.q_emb")} AS cosine
  FROM assigned a JOIN qprobe q USING (cell)
  WHERE a.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {K}
"""


ANN_IVF_STREAM_SQL = _ivf_stream_sql()


# --- seeded vs trained recall at equal n_probe ------------------------------

def ann_recall_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k / MRR of the UNTRAINED (raw seed vectors, c0) vs the
    TRAINED (2 Lloyd iterations, c2) quantizer at the SAME cell count
    and n_probe, against brute-force ground truth — the eval that
    justifies wiring `kmeans_fit` into the index build: training moves
    centroids toward the data, so equal probe budgets recover more of
    the true neighbors."""
    apply_runtime_conf(spark)
    emb = clustering_q._spread_emb(spark, sf_dir)
    exact = S.cosine_topk(emb, QUERY_IDS, K)
    seed = C._seed_centroids(emb, C.KMEANS_SEED_IDS,
                             "vec_id", "embedding")
    trained = clustering_q._fitted(spark, sf_dir)
    evals = []
    for name, cents in (("ivf_seed", seed), ("ivf_trained", trained)):
        approx = S.cosine_topk_ivf(emb, QUERY_IDS, K, cents=cents)
        evals.append(S.retrieval_eval(approx, exact)
                     .select(F.lit(name).alias("index"), "*"))
    return evals[0].unionByName(evals[1])


ANN_RECALL_TRAINED_SQL = (
    f"WITH exact AS ({ANN_TOPK_BRUTEFORCE_SQL})"
    + _eval_block("ivf_seed", _ivf_from_fit_sql(0))
    + " UNION ALL "
    + _eval_block("ivf_trained", _ivf_from_fit_sql(C.KMEANS_ITERS))
)


# --- atomic quantizer retrain through the blue/green pointer ----------------

def _blue_green_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Corpus merge table + a blue/green index root: generation 1
    built under the RAW SEEDS, then `retrain_ann_index` builds
    generation 2 under the 2-iteration `kmeans_fit` quantizer and
    flips the pointer atomically. Both generations stay readable (the
    in-flight-reader guarantee); the pointer names gen 2."""
    def _build(path: str) -> None:
        src = os.path.join(path, "src")
        emb = clustering_q._spread_emb(spark, sf_dir).select(
            F.col("vec_id").cast("string").alias("vec_id"), "embedding")
        merge = ing.foreach_batch_upsert(src, ["vec_id"], n_buckets=8,
                                         txn_app_id="fixture",
                                         mode="latest_wins")
        merge(emb, 1)
        seed = C._seed_centroids(load(spark, sf_dir, "embeddings"),
                                 C.KMEANS_SEED_IDS, "vec_id", "embedding")
        root = os.path.join(path, "root")
        AI.init_ann_index(spark, src, root, seed)
        AI.retrain_ann_index(spark, src, root,
                             clustering_q._fitted(spark, sf_dir))

    return fixture_dir("ann_blue_green", sf_dir, _build)


def ann_retrain_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrain-recall row: recall@k / MRR against brute-force
    truth for BOTH sides of an atomic quantizer swap — `ivf_seed`
    served from the superseded generation-1 index (still readable for
    in-flight queries), `ivf_trained` from the generation the live
    pointer now names. Shares `ANN_RECALL_TRAINED_SQL`: the oracle
    re-runs the k-means fit and both IVF answers from scratch, so a
    hash match proves the swap changed WHICH persisted quantizer
    serves reads without touching the arithmetic — and that neither
    generation ever serves the other's postings."""
    apply_runtime_conf(spark)
    base = _blue_green_fixture(spark, sf_dir)
    emb = clustering_q._spread_emb(spark, sf_dir)
    exact = S.cosine_topk(emb, QUERY_IDS, K)
    live = AI.live_index_path(spark, os.path.join(base, "root"))
    assert live.endswith("gen-000002"), live
    old_gen = os.path.join(base, "root", "gen-000001")
    q = _queries_df(emb)
    evals = []
    for name, idx in (("ivf_seed", old_gen), ("ivf_trained", live)):
        approx = AI.ann_topk_indexed(spark, idx, q, K,
                                     n_probe=S.IVF_NPROBE)
        evals.append(S.retrieval_eval(approx, exact)
                     .select(F.lit(name).alias("index"), "*"))
    return evals[0].unionByName(evals[1])


ANN_RETRAIN_SWAP_SQL = ANN_RECALL_TRAINED_SQL
