"""Registry queries for the training-data operators over the
`documents` table, each with an exact DuckDB oracle that mirrors the
same md5-based deterministic algorithms (see training/dedup.py,
training/text.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ..training import dedup as D
from ..training import text as T
from ._helpers import apply_runtime_conf

_K = D.NUM_HASHES
_B = D.BANDS
_R = D.ROWS_PER_BAND


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    return load(spark, sf_dir, "documents")


# Shared oracle fragments -------------------------------------------------

# DuckDB mirror of training.dedup.md5_long — the single cross-engine
# hashing idiom. `{x}` is the expression to hash.
def _md5_long_sql(x: str) -> str:
    return f"CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


_NORM_CTE = r"""
norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
)
"""

_SHINGLES_CTE = _NORM_CTE + """,
shw AS (SELECT doc_id, norm, string_split(norm, ' ') AS w FROM norm),
sh AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(w) >= 3
         THEN list_transform(generate_series(1, len(w)-2),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE [norm] END) AS shingles
  FROM shw
)
"""


# --- exact dedup ---------------------------------------------------------

def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(_docs(spark, sf_dir))


DOC_EXACT_DEDUP_SQL = "WITH " + _NORM_CTE + """
SELECT sha256(norm) AS text_sha, COUNT(*) AS n_docs,
       MIN(doc_id) AS representative_id
FROM norm GROUP BY sha256(norm)
"""


# --- MinHash-LSH near-dup pairs -----------------------------------------

def doc_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_near_dup_pairs(_docs(spark, sf_dir))


def _minhash_sql() -> str:
    from ..training.dedup import MERSENNE_P, _perm_params

    sig_items = ", ".join(
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % {MERSENNE_P}))"
        for a, b in _perm_params(_K))
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS key FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"CAST(sig[{b * _R + r + 1}] AS VARCHAR)" for r in range(_R)))
        for b in range(_B))
    return ("WITH " + _SHINGLES_CTE + f""",
hashed AS (
  SELECT doc_id, list_transform(
      shingles,
      s -> {_md5_long_sql('s')} % {MERSENNE_P}) AS h
  FROM sh
),
sig AS (SELECT doc_id, [{sig_items}] AS sig FROM hashed),
bands AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT id_a, id_b,
       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
       / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE) AS jaccard
FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE) >= 0.5
""")


DOC_MINHASH_PAIRS_SQL = _minhash_sql()


# --- SimHash -------------------------------------------------------------

def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(_docs(spark, sf_dir))


def _simhash_sql() -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(h, x -> 2*((x >> {b}) & 1) - 1)) > 0 "
        f"THEN CAST({2 ** b} AS BIGINT) ELSE 0 END)"
        for b in range(D.SIMHASH_BITS))
    return ("WITH " + _NORM_CTE + f""",
words AS (SELECT doc_id, list_distinct(string_split(norm, ' ')) AS w FROM norm),
hashes AS (
  SELECT doc_id, list_transform(
      w, x -> {_md5_long_sql('x')}) AS h
  FROM words
)
SELECT doc_id, CAST(""" + bit_terms + " AS BIGINT) AS simhash FROM hashes")


DOC_SIMHASH_SQL = _simhash_sql()


# --- token counts + quality + language ID -------------------------------

def doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.document_profile(_docs(spark, sf_dir))


def _profile_sql() -> str:
    stop_list = "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS) + "]"
    langs = sorted(T.LANG_MARKERS)
    scores = {
        lang: ("len(list_filter(w, x -> list_contains(["
               + ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
               + "], x)))")
        for lang in langs
    }
    max_score = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    winner = "CASE WHEN " + max_score + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{lang} = {max_score} THEN '{lang}'" for lang in langs) + " END"
    score_cols = ", ".join(f"{sql} AS s_{lang}" for lang, sql in scores.items())
    return ("WITH " + _NORM_CTE + f""",
base AS (SELECT doc_id, norm, string_split(norm, ' ') AS w FROM norm),
scored AS (SELECT *, {score_cols} FROM base)
SELECT doc_id,
  CAST(len(w) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
  CAST(length(norm) AS BIGINT) AS n_chars,
  CAST(len(w) AS BIGINT) AS n_words,
  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
      / CAST(len(w) AS DOUBLE) AS mean_word_len,
  CAST(length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
      / CAST(length(norm) AS DOUBLE) AS punct_ratio,
  CAST(len(list_filter(w, x -> list_contains({stop_list}, x))) AS DOUBLE)
      / CAST(len(w) AS DOUBLE) AS stopword_ratio,
  {winner} AS lang_guess
FROM scored""")


DOC_PROFILE_SQL = _profile_sql()


# --- corpus vocabulary: top-k tokens --------------------------------------

_VOCAB_K = 100


def doc_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: the `_VOCAB_K` most frequent
    whitespace tokens of normalized text with doc frequencies — the
    groupwork behind stopword lists, tokenizer audits and vocab
    pruning. One explode + one aggregation; the top-k has a total
    order (count DESC, token ASC) so the result is deterministic."""
    from ..operators.topk import top_k_rows
    from ..training.dedup import normalize_text

    docs = _docs(spark, sf_dir)
    tokens = docs.select(
        F.col("doc_id"),
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("token"))
    counts = tokens.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"))
    return top_k_rows(counts,
                      [F.col("n_occurrences").desc(), F.col("token")],
                      _VOCAB_K)


DOC_TOKEN_TOPK_SQL = "WITH " + _NORM_CTE + f""",
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM tok GROUP BY token
)
SELECT token, n_occurrences, n_docs FROM counts
ORDER BY n_occurrences DESC, token LIMIT {_VOCAB_K}
"""


# --- within-doc repetition (Gopher filters) ------------------------------


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate
    word-bigram fraction and most-frequent-bigram fraction
    (training/text.py:repetition_profile). One explode + two hash
    aggs, the second a subset re-group of the first."""
    return T.repetition_profile(_docs(spark, sf_dir))


DOC_REPETITION_SQL = "WITH " + _NORM_CTE + """,
w AS (SELECT doc_id, norm, string_split(norm, ' ') AS w FROM norm),
bg AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 2
              THEN list_transform(generate_series(1, len(w)-1),
                                  i -> w[i] || ' ' || w[i+1])
              ELSE [] END AS bigrams
  FROM w
),
ex AS (SELECT doc_id, unnest(bigrams) AS bigram FROM bg),
per AS (SELECT doc_id, bigram, COUNT(*) AS n FROM ex GROUP BY doc_id, bigram),
st AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
         CAST(MAX(n) AS BIGINT) AS top_n
  FROM per GROUP BY doc_id
)
SELECT n.doc_id,
       COALESCE(st.n_bigrams, 0) AS n_bigrams,
       COALESCE(st.n_distinct_bigrams, 0) AS n_distinct_bigrams,
       CASE WHEN st.n_bigrams > 0
            THEN CAST(st.n_bigrams - st.n_distinct_bigrams AS DOUBLE)
                 / CAST(st.n_bigrams AS DOUBLE)
            ELSE 0.0 END AS dup_bigram_ratio,
       CASE WHEN st.n_bigrams > 0
            THEN CAST(st.top_n AS DOUBLE) / CAST(st.n_bigrams AS DOUBLE)
            ELSE 0.0 END AS top_bigram_ratio
FROM norm n LEFT JOIN st ON n.doc_id = st.doc_id
"""


# --- PII scrubbing -------------------------------------------------------

# The synthetic corpus contains no PII, so the query injects a
# deterministic fixture per doc_id (same closed-form augmentation in
# both engines — the ws_correction_fixpoint pattern) and then counts /
# redacts it with training/text.py:scrub_pii.


def _augmented_text() -> "F.Column":
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(d % 3 == 0, F.concat(F.lit(" see https://example.org/d/"),
                                    d.cast("string"))).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(F.lit(" mail user"), d.cast("string"),
                                    F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.concat(F.lit(" call +254700"),
                                    F.lpad((d % 1000).cast("string"), 4, "0"))
               ).otherwise(F.lit("")),
    )


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id",
                                       _augmented_text().alias("text"))
    cols = T.scrub_pii(F.col("text"))
    # pinned column list: the operator dict also carries the raw
    # redacted text (for pipeline composition), which this report
    # summarizes via clean_md5/clean_len instead of shipping
    keep = ["n_urls", "n_emails", "n_phones", "clean_md5", "clean_len"]
    return docs.select("doc_id", *[cols[k].alias(k) for k in keep])


_AUG_SQL = """
aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' see https://example.org/d/' || CAST(doc_id AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call +254700' || lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0')
                 ELSE '' END AS text
  FROM documents
)
"""

DOC_PII_SCRUB_SQL = f"""
WITH {_AUG_SQL},
norm AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM aug
),
red AS (
  SELECT doc_id, norm,
         regexp_replace(
           regexp_replace(
             regexp_replace(norm, '{T.PII_URL}', '<URL>', 'g'),
             '{T.PII_EMAIL}', '<EMAIL>', 'g'),
           '{T.PII_PHONE}', '<PHONE>', 'g') AS clean
  FROM norm
)
SELECT doc_id,
       CAST(len(regexp_extract_all(norm, '{T.PII_URL}')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(norm, '{T.PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(norm, '{T.PII_PHONE}')) AS BIGINT) AS n_phones,
       md5(clean) AS clean_md5,
       CAST(len(clean) AS BIGINT) AS clean_len
FROM red
"""


# --- per-doc top terms ---------------------------------------------------

_TOP_TERMS_K = 3


def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by term frequency (integer-total-order:
    tf desc, token asc) with corpus document frequency attached.
    Shapes: explode + (doc, token) agg; vocabulary df is a re-group of
    the tf frame (tiny, broadcast back); per-doc top-k is a window on
    the doc key."""
    from pyspark.sql import Window
    from ..training.dedup import normalize_text

    docs = _docs(spark, sf_dir)
    tf = (docs.select("doc_id",
                      F.explode(F.split(normalize_text(F.col("text")), " "))
                      .alias("token"))
          .groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    # ONE corpus explode: df and the per-doc top-k are both windows
    # over the same tf frame (Catalyst does not share a relation
    # across two groupBy consumers — the previous df-as-regroup plan
    # re-ran the explode, 2x the map work; the window form re-keys
    # the already-collapsed tf rows instead, the same one-pass trade
    # as bm25_topk's in-plan df, training/ranking.py)
    tf = tf.withColumn("df_docs", F.count(F.lit(1)).over(
        Window.partitionBy("token")).cast("long"))
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), "token")
    return (tf.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _TOP_TERMS_K)
            .select("doc_id", F.col("rank").cast("int").alias("rank"),
                    "token", "tf", "df_docs"))


DOC_TOP_TERMS_SQL = "WITH " + _NORM_CTE + f""",
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM norm),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_docs
          FROM tf GROUP BY token),
ranked AS (
  SELECT doc_id, token, tf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tf DESC, token) AS rank
  FROM tf
)
SELECT r.doc_id, CAST(r.rank AS INTEGER) AS rank, r.token, r.tf, d.df_docs
FROM ranked r JOIN dfreq d ON r.token = d.token
WHERE r.rank <= {_TOP_TERMS_K}
"""


# --- eval-set decontamination --------------------------------------------

# Probe (eval) set: doc_id % 100 == 7 — deterministic stand-in for a
# benchmark suite. A train doc is contaminated if it shares >= _DECON_K
# shingle hashes with any probe doc.
_DECON_K = 2


def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination report: (train_doc_id, probe_doc_id, n_shared)
    for every train doc sharing >= K word-shingle hashes with an
    eval-set doc. The probe posting list is tiny (|eval| docs) and
    broadcasts; the train side is one scan of the shared shingle cache
    — the standard n-gram-overlap decontamination pass at corpus
    scale."""
    from ..training.dedup import _shingled

    sh = _shingled(_docs(spark, sf_dir), "text", "doc_id")
    posting = sh.select(F.col("id"), F.explode("h").alias("hash"))
    is_probe = F.col("id") % 100 == 7
    probes = (posting.where(is_probe)
              .select(F.col("id").alias("probe_doc_id"), "hash").distinct())
    train = (posting.where(~is_probe)
             .select(F.col("id").alias("train_doc_id"), "hash").distinct())
    return (train.join(F.broadcast(probes), "hash")
            .groupBy("train_doc_id", "probe_doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .where(F.col("n_shared") >= _DECON_K))


def _contamination_sql() -> str:
    return ("WITH " + _SHINGLES_CTE + f""",
hashed AS (
  SELECT doc_id, list_distinct(list_transform(
      shingles, s -> {_md5_long_sql('s')})) AS h
  FROM sh
),
posting AS (SELECT doc_id, unnest(h) AS hash FROM hashed),
probes AS (SELECT doc_id AS probe_doc_id, hash FROM posting WHERE doc_id % 100 = 7),
train AS (SELECT doc_id AS train_doc_id, hash FROM posting WHERE doc_id % 100 <> 7)
SELECT train_doc_id, probe_doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM train JOIN probes USING (hash)
GROUP BY train_doc_id, probe_doc_id
HAVING COUNT(*) >= {_DECON_K}""")


DOC_CONTAMINATION_SQL = _contamination_sql()


# --- deterministic mixture sample ----------------------------------------

# Per-source mixing weights: drop most of src0, half-weight the
# default, keep all of src1 — the shape of a real data-mixture tune.
_MIX_RATES = {"src0": 0.1, "src1": 1.0, "src2": 0.25}
_MIX_DEFAULT = 0.5
_MIX_SALT = "mix-v1"


def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..training.sampling import deterministic_sample

    kept = deterministic_sample(
        _docs(spark, sf_dir), _MIX_DEFAULT, stratify_col="source",
        rates=_MIX_RATES, salt=_MIX_SALT)
    return kept.select("doc_id", "source")


def _mixture_sql() -> str:
    from ..training.sampling import SCALE

    cases = " ".join(
        f"WHEN '{v}' THEN {int(r * SCALE)}"
        for v, r in sorted(_MIX_RATES.items()))
    thr = f"CASE source {cases} ELSE {int(_MIX_DEFAULT * SCALE)} END"
    h = _md5_long_sql(f"'{_MIX_SALT}:' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, source FROM documents
WHERE {h} % {SCALE} < {thr}
"""


DOC_MIXTURE_SAMPLE_SQL = _mixture_sql()


# --- language-ID confusion matrix -----------------------------------------

def doc_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation of the lang-ID heuristic against the labelled lang
    column: one row per (lang, lang_guess) with counts — the corpus-
    governance query a curation pipeline runs after any lang-ID
    change."""
    docs = T.spread_narrow_scan(_docs(spark, sf_dir))
    guesses = T.language_id_frame(docs, key_cols=("doc_id", "lang"))
    return (guesses.groupBy("lang", "lang_guess")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def _lang_confusion_sql() -> str:
    langs = sorted(T.LANG_MARKERS)
    scores = {
        lang: ("len(list_filter(w, x -> list_contains(["
               + ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
               + "], x)))")
        for lang in langs
    }
    max_score = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    winner = "CASE WHEN " + max_score + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{lang} = {max_score} THEN '{lang}'" for lang in langs) + " END"
    score_cols = ", ".join(f"{sql} AS s_{lang}" for lang, sql in scores.items())
    return ("WITH " + _NORM_CTE + f""",
base AS (
  SELECT d.lang, string_split(n.norm, ' ') AS w
  FROM documents d JOIN norm n USING (doc_id)
),
scored AS (SELECT *, {score_cols} FROM base)
SELECT lang, {winner} AS lang_guess, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM scored GROUP BY lang, {winner}""")


DOC_LANG_CONFUSION_SQL = _lang_confusion_sql()


# --- quality gate applied ------------------------------------------------

def doc_quality_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Thresholds chosen to DISCRIMINATE on the synthetic corpus
    # (10-99 words, mean word length 3.7-5.3, zero punctuation):
    # the default envelope would keep every doc and prove nothing.
    kept = T.quality_filter(_docs(spark, sf_dir),
                            min_words=25, min_mean_word_len=4.0)
    return kept.select(
        "doc_id", F.length("text").cast("long").alias("n_chars"))


DOC_QUALITY_CORPUS_SQL = r"""
WITH base AS (
  SELECT doc_id, length(text) AS raw_len,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
m AS (
  SELECT doc_id, raw_len,
         string_split(norm, ' ') AS w, norm
  FROM base
),
scored AS (
  SELECT doc_id, raw_len,
    CAST(len(w) AS BIGINT) AS n_words,
    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS mean_word_len,
    CAST(length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
        / CAST(length(norm) AS DOUBLE) AS punct_ratio
  FROM m
)
SELECT doc_id, CAST(raw_len AS BIGINT) AS n_chars
FROM scored
WHERE n_words >= 25 AND n_words <= 100000
  AND punct_ratio <= 0.2
  AND mean_word_len >= 4.0 AND mean_word_len <= 12.0
"""


# --- fingerprint ---------------------------------------------------------

def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scalar projection of the array sketch (fp size + joined hashes) so
    # the driver's pandas canonicalizer can sort/hash the result —
    # array<string> cells are unhashable ndarray on the pandas side.
    docs = _docs(spark, sf_dir)
    fp = T.fingerprint(F.col("text"))
    return docs.select(
        F.col("doc_id"),
        F.size(fp).cast("long").alias("fp_n"),
        F.concat_ws(",", fp).alias("fp_sketch"),
    )


DOC_FINGERPRINT_SQL = "WITH " + _NORM_CTE + """,
fp AS (
  SELECT doc_id, list_sort(list_distinct(list_filter(
      list_transform(generate_series(1, greatest(length(norm) - 7, 1)),
                     i -> md5(substr(norm, i, 8))),
      h -> h LIKE '%0'))) AS fp
  FROM norm
)
SELECT doc_id, CAST(len(fp) AS BIGINT) AS fp_n,
       COALESCE(array_to_string(fp, ','), '') AS fp_sketch
FROM fp
"""


# --- fingerprint containment pairs ---------------------------------------

def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sample_mod=4 (not the 1/16 default): the synthetic docs are
    # 10-99 words, so a 1/16 shingle sample starves min_fp; real
    # multi-KB documents keep the sparser default.
    return D.fingerprint_containment_pairs(_docs(spark, sf_dir),
                                           sample_mod=4)


DOC_CONTAINMENT_PAIRS_SQL = "WITH " + _SHINGLES_CTE + f""",
fp0 AS (
  SELECT doc_id, list_sort(list_distinct(list_filter(
      list_transform(shingles, s -> {_md5_long_sql('s')}),
      h -> h % 4 = 0))) AS fp
  FROM sh
),
fpn AS (SELECT * FROM fp0 WHERE len(fp) >= 5),
posting AS (SELECT doc_id, unnest(fp) AS h FROM fpn),
rare AS (SELECT h FROM posting GROUP BY h HAVING COUNT(*) <= 100),
blocked AS (SELECT p.doc_id, p.h FROM posting p JOIN rare USING (h)),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM blocked x JOIN blocked y
    ON x.h = y.h AND x.doc_id < y.doc_id
)
SELECT id_a, id_b,
       CAST(len(list_intersect(a.fp, b.fp)) AS DOUBLE)
       / CAST(least(len(a.fp), len(b.fp)) AS DOUBLE) AS containment
FROM cand JOIN fpn a ON cand.id_a = a.doc_id JOIN fpn b ON cand.id_b = b.doc_id
WHERE CAST(len(list_intersect(a.fp, b.fp)) AS DOUBLE)
      / CAST(least(len(a.fp), len(b.fp)) AS DOUBLE) >= 0.5
"""


# --- exact n-gram Jaccard pairs (inverted-index blocked) -----------------

_JACCARD_MAX_DF = 100

# The verified pair set feeds both the pairs query and the clustering
# query; memoize + cache it per (session, sf_dir) so the second
# consumer reuses the materialized pairs instead of re-running the
# whole shingle/posting/verify pipeline (same pattern as the
# engagement spine's _imputed).
_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # applicationId, not id(spark) — see queries/engagement.py.
    # localCheckpoint, not .cache(): the pair set is tiny but its
    # lineage is the whole shingle/posting/verify DAG, which every
    # consumer (doc_dedup_clusters' iterative joins reference it once
    # PER ROUND) would otherwise re-analyze.
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _PAIRS_CACHE.get(key)
    if df is None:
        df = D.ngram_jaccard_pairs(
            _docs(spark, sf_dir),
            max_doc_freq=_JACCARD_MAX_DF).localCheckpoint(eager=False)
        _PAIRS_CACHE[key] = df
    return df


def doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dups via rare-shingle inverted-index
    blocking (never all-pairs); the oracle applies the identical
    blocking, so results match by construction."""
    return _jaccard_pairs(spark, sf_dir)


_JACCARD_CTES = _SHINGLES_CTE + f""",
shh AS (
  SELECT doc_id, list_distinct(list_transform(
      shingles,
      s -> {_md5_long_sql('s')})) AS shingles
  FROM sh
),
posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM shh),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle
  HAVING COUNT(*) <= {_JACCARD_MAX_DF}
),
blocked AS (SELECT p.doc_id, p.shingle FROM posting p JOIN rare USING (shingle)),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM blocked x JOIN blocked y
    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
)
"""

_JACCARD_SELECT = """
SELECT id_a, id_b,
       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
       / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE) AS jaccard
FROM cand JOIN shh a ON cand.id_a = a.doc_id JOIN shh b ON cand.id_b = b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE) >= 0.5
"""

DOC_JACCARD_PAIRS_SQL = "WITH " + _JACCARD_CTES + _JACCARD_SELECT


# --- deduplicated corpus (keep one per cluster) ---------------------------

def doc_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION applied: every doc_id that survives
    near-dup dedup — cluster representatives (min id per connected
    component) plus all unclustered docs. This is the frame a training
    pipeline feeds downstream; an anti-join of the scan against the
    (tiny) non-representative set, so it composes with any filter at
    full scale."""
    docs = _docs(spark, sf_dir)
    clusters = D.near_dup_clusters(_jaccard_pairs(spark, sf_dir))
    drop = clusters.where(F.col("doc_id") != F.col("cluster_rep")) \
        .select("doc_id")
    return (docs.join(drop, "doc_id", "left_anti")
            .select("doc_id", F.length("text").cast("long").alias("n_chars")))


DOC_DEDUP_CORPUS_SQL = ("WITH RECURSIVE " + _JACCARD_CTES + f""",
pairs AS ({_JACCARD_SELECT}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node, MIN(label) AS cluster_rep FROM reach GROUP BY node),
dropped AS (SELECT node AS doc_id FROM comp WHERE node <> cluster_rep)
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
""")


# --- near-dup clusters (connected components) ----------------------------

def doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact-Jaccard near-dup graph:
    (doc_id, cluster_rep, cluster_size) per clustered doc. Spark runs
    Pregel-style min-label propagation; the oracle computes the same
    components with a recursive CTE (min reachable id per node)."""
    return D.near_dup_clusters(_jaccard_pairs(spark, sf_dir))


def doc_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same components via large-star/small-star contraction
    (training/dedup.py:near_dup_clusters_star) — the O(log^2 n)-round
    100 TB path — hash-checked against the SAME recursive-CTE oracle
    as the label-propagation variant."""
    return D.near_dup_clusters_star(_jaccard_pairs(spark, sf_dir))


DOC_DEDUP_CLUSTERS_SQL = ("WITH RECURSIVE " + _JACCARD_CTES + f""",
pairs AS ({_JACCARD_SELECT}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node, MIN(label) AS cluster_rep FROM reach GROUP BY node)
SELECT c.node AS doc_id, c.cluster_rep, s.cluster_size
FROM comp c JOIN (
  SELECT cluster_rep, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_rep
) s USING (cluster_rep)
""")


# --- cross-source near-dup overlap ---------------------------------------


def doc_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-curation diagnostic: how many near-duplicate pairs cross
    each (source, source) boundary — high cross-source overlap means
    one crawl is republishing another. Rides the cached jaccard pair
    frame; the docs side is a two-column dimension, broadcast."""
    pairs = _jaccard_pairs(spark, sf_dir)
    src = _docs(spark, sf_dir).select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("did_a"),
                   F.col("source").alias("src_raw_a"))
    b = src.select(F.col("doc_id").alias("did_b"),
                   F.col("source").alias("src_raw_b"))
    joined = (pairs
              .join(F.broadcast(a), pairs.id_a == a.did_a)
              .join(F.broadcast(b), pairs.id_b == b.did_b))
    # order the source pair canonically so (x,y) and (y,x) merge
    return (joined.select(
                F.least("src_raw_a", "src_raw_b").alias("source_a"),
                F.greatest("src_raw_a", "src_raw_b").alias("source_b"))
            .groupBy("source_a", "source_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs")))


DOC_SOURCE_OVERLAP_SQL = ("WITH " + _JACCARD_CTES + f""",
pairs AS ({_JACCARD_SELECT})
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs p
JOIN documents da ON p.id_a = da.doc_id
JOIN documents db ON p.id_b = db.doc_id
GROUP BY least(da.source, db.source), greatest(da.source, db.source)
""")


# --- incremental (batch-vs-corpus) dedup ---------------------------------

# New-arrivals batch: doc_id % 10 == 9 — a deterministic stand-in for
# a crawl increment; everything else is the existing corpus.
_BATCH_MOD, _BATCH_REM = 10, 9


def doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-admission check: match the new batch against the existing
    corpus with banded MinHash-LSH (training/dedup.py:
    minhash_incremental_matches — O(batch), not O(corpus), per
    increment) and report per batch doc its verified corpus-match
    count and the admit/reject decision."""
    docs = _docs(spark, sf_dir)
    is_batch = (F.col("doc_id") % _BATCH_MOD) == _BATCH_REM
    matches = D.minhash_incremental_matches(
        docs.where(~is_batch), docs.where(is_batch))
    per_doc = (matches.groupBy("batch_id")
               .agg(F.count(F.lit(1)).cast("long").alias("n_matches")))
    batch_ids = docs.where(is_batch).select("doc_id")
    return (batch_ids
            .join(per_doc, batch_ids.doc_id == per_doc.batch_id, "left")
            .select("doc_id",
                    F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
                    F.col("n_matches").isNull().alias("admitted")))


def _incremental_sql() -> str:
    from ..training.dedup import MERSENNE_P, _perm_params

    sig_items = ", ".join(
        f"list_min(list_transform(h, x -> ({a} * x + {b}) % {MERSENNE_P}))"
        for a, b in _perm_params(_K))
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS key FROM sig".format(
            b=b,
            key=" || '|' || ".join(
                f"CAST(sig[{b * _R + r + 1}] AS VARCHAR)" for r in range(_R)))
        for b in range(_B))
    jac = ("CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)"
           " / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE)")
    return ("WITH " + _SHINGLES_CTE + f""",
hashed AS (
  SELECT doc_id, list_transform(
      shingles,
      s -> {_md5_long_sql('s')} % {MERSENNE_P}) AS h
  FROM sh
),
sig AS (SELECT doc_id, [{sig_items}] AS sig FROM hashed),
bands AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT x.doc_id AS batch_id, y.doc_id AS corpus_id
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
  WHERE x.doc_id % {_BATCH_MOD} = {_BATCH_REM}
    AND y.doc_id % {_BATCH_MOD} <> {_BATCH_REM}
),
ver AS (
  SELECT batch_id FROM cand
  JOIN sh a ON cand.batch_id = a.doc_id
  JOIN sh b ON cand.corpus_id = b.doc_id
  WHERE {jac} >= 0.5
),
m AS (SELECT batch_id, CAST(COUNT(*) AS BIGINT) AS n_matches
      FROM ver GROUP BY batch_id)
SELECT d.doc_id, COALESCE(m.n_matches, 0) AS n_matches,
       m.n_matches IS NULL AS admitted
FROM documents d LEFT JOIN m ON d.doc_id = m.batch_id
WHERE d.doc_id % {_BATCH_MOD} = {_BATCH_REM}
""")


DOC_INCREMENTAL_DEDUP_SQL = _incremental_sql()
