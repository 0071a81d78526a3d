"""Byte-pair-encoding tokenizer training (Sennrich et al. 2016) as a
Spark-iterative fit.

The reference counts tokens only for analysis exports (SURVEY §2.7);
a training-data pipeline must also TRAIN the tokenizer. The classic
formulation is corpus-scale friendly: BPE statistics depend only on
the distinct-word table weighted by occurrence counts — at 100 TB of
text that table is ~10^8 rows (vocabulary growth is sub-linear), so
the corpus is scanned ONCE to build it and never again.

Per merge round:
* adjacent-pair counts — one zero-join explode of the word-symbol
  arrays into (left, right, weight) plus a hash aggregation
  (map-side combinable);
* argmax — count DESC, then (left, right) lexicographic for a
  deterministic tie-break; ONE row reaches the driver;
* merge application — a pure `aggregate` fold over each word's
  symbol array (greedy leftmost non-overlapping, the canonical
  semantics: a merged token never re-pairs within its own round
  because merged == left||right can never equal left). Zero shuffle.

So an N-merge fit costs one corpus pass + N small explode/agg jobs
over the vocabulary — no round ever re-shuffles or re-reads the
corpus. The DuckDB oracle (queries/bpe_q.py) re-runs the identical
fit round-by-round in pure SQL using the row-based (word, pos, sym)
form with gaps-and-islands parity for the greedy overlap rule, and
the final tokenized frequency table hash-matches — mechanism-
independent proof that the fold implements canonical BPE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

END_OF_WORD = "</w>"

#: BPE fit rounds between lineage-truncating localCheckpoints: bounds
#: the nested-lambda fold depth (codegen cost grows with it) at this
#: many rounds while amortizing the vocab-frame materialization the
#: checkpoint costs across as many merges.
CHECKPOINT_EVERY = 4


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc): distinct normalized words with occurrence counts —
    the ONLY corpus-scale pass of a BPE fit."""
    from .text import spread_narrow_scan

    words = F.split(normalize_text(F.col(text_col)), " ")
    return (spread_narrow_scan(docs)
            .select(F.explode(words).alias("word"))
            .where(F.length("word") > 0)
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("wc")))


def _chars_plus_eow(word: F.Column) -> F.Column:
    """word -> [c1, c2, ..., '</w>'] (character symbols + end-of-word
    marker, the canonical BPE alphabet)."""
    chars = F.transform(F.sequence(F.lit(1), F.length(word)),
                        lambda i: word.substr(i, F.lit(1)))
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _initial_symbols() -> F.Column:
    return _chars_plus_eow(F.col("word"))


def _apply_merge(syms: F.Column, left: str, right: str) -> F.Column:
    """Greedy leftmost merge of adjacent (left, right) -> left||right
    as a sequential fold; canonical single-pass-per-round BPE."""
    merged = left + right
    empty = F.array().cast("array<string>")
    return F.aggregate(
        syms, empty,
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(s))))


def bpe_fit(docs: DataFrame, n_merges: int,
            text_col: str = "text") -> tuple[list[dict], DataFrame]:
    """Learn `n_merges` merges. Returns (merge list [{rank, left,
    right, merged, pair_count}], the final symbolized vocab frame).
    Fewer merges come back if the vocabulary runs out of pairs."""
    from ..session import scoped_cache

    vocab = scoped_cache(word_vocab(docs, text_col))
    cur = vocab.select("word", "wc", _initial_symbols().alias("syms"))
    merges: list[dict] = []
    for rank in range(n_merges):
        pair = F.explode(F.arrays_zip(
            F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("l"),
            F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("r")))
        best = (cur.select("wc", pair.alias("p"))
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("wc").cast("long").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "l", "r")
                .limit(1).collect())
        if not best or best[0]["cnt"] < 1:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        merges.append({"rank": rank, "left": l, "right": r,
                       "merged": l + r, "pair_count": int(cnt)})
        # Truncate lineage every CHECKPOINT_EVERY rounds (lazy
        # localCheckpoint: the next round's best-pair job materializes
        # it — no extra job). Chaining ALL folds makes round k re-apply
        # merges 1..k-1 over the cached vocab — O(n_merges²) fold work
        # and a k-deep nested-lambda expression whose codegen grows per
        # round; checkpointing EVERY round (the r14 shape) swings the
        # other way — the per-round materialization of the vocab frame
        # cost more than the ≤1-deep folds it saved at bench vocab
        # sizes (doc_bpe_tokens regressed 0.90x, r14 VERDICT). Every
        # K rounds bounds the fold depth at K while paying 1/K of the
        # materializations.
        if (rank + 1) % CHECKPOINT_EVERY == 0:
            cur = (cur.select("word", "wc",
                              _apply_merge(F.col("syms"), l, r)
                              .alias("syms"))
                   .localCheckpoint(eager=False))
        else:
            cur = cur.select("word", "wc",
                             _apply_merge(F.col("syms"), l, r)
                             .alias("syms"))
    return merges, cur


def bpe_token_counts(symbolized_vocab: DataFrame) -> DataFrame:
    """(token, total_count): corpus frequency of every token in the
    fitted segmentation — one explode + agg over the vocab frame."""
    return (symbolized_vocab
            .select("wc", F.explode("syms").alias("token"))
            .groupBy("token")
            .agg(F.sum("wc").cast("long").alias("total_count")))


def bpe_encode(docs: DataFrame, merges: list[dict],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, tokens array<string>): apply a fitted merge list to a
    corpus — a zero-shuffle projection chain (one fold per merge, in
    rank order, exactly how the fit applied them). The inference-side
    counterpart of `bpe_fit`; at serving scale the merge list is a
    plan literal, no join, no shuffle."""
    words = F.split(normalize_text(F.col(text_col)), " ")

    def encode_word(w: F.Column) -> F.Column:
        col = _chars_plus_eow(w)
        # merges stay word-local, exactly as the fit counted them —
        # a flat-stream fold would be equivalent (no learnable merge
        # can span '</w>') but word-local needs no such argument
        for m in sorted(merges, key=lambda m: m["rank"]):
            col = _apply_merge(col, m["left"], m["right"])
        return col

    return (docs.select(F.col(id_col),
                        F.filter(words, lambda w: F.length(w) > 0)
                        .alias("__w"))
            .select(F.col(id_col),
                    F.flatten(F.transform(F.col("__w"), encode_word))
                    .alias("tokens")))
