"""Deterministic epoch shuffle + shard assignment — the "globally
shuffle the corpus every epoch, then write N shard files" step of a
training-data pipeline, without ever running a true random global
sort.

The reference exports its analysis corpus as a handful of
deterministic CSVs (SURVEY §2.2 K2/K3); a pre-training exporter needs
the same determinism at 100 TB with an extra requirement: each epoch
must present the documents in a different, *reproducible* order,
sharded so that 1000 trainers can each read their slice without
coordination.

Design (the hash-shuffle idiom, e.g. how webdataset/TFRecord exports
are laid out):

* shuffle key = md5_long("epoch<k>:" || doc_id) — a per-epoch
  pseudo-random total order that needs no RNG state, so any subset of
  the corpus can be planned independently (zero coordination, exactly
  the property a resumable 100 TB export needs);
* shard     = key % n_shards — uniform, stable within an epoch, and a
  pure projection (NO shuffle to decide placement);
* pos_in_shard = row_number over (shard, order by key, doc_id) — ONE
  hash-partitioned window, parallel across shards; never a global
  sort. The (key, doc_id) order is total, so output is deterministic
  even on hash collisions.

Writing the physical shards is then
``plan.repartition(n_shards, "shard").sortWithinPartitions(...)`` —
the same one-shuffle shape `sinks/layout.py:write_partitioned` uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import md5_long


def epoch_key(doc_id, epoch: int):
    """Per-epoch pseudo-random 60-bit sort key for a document."""
    c = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    return md5_long(F.concat(F.lit(f"epoch{epoch}:"), c.cast("string")))


def shard_plan(docs: DataFrame, n_shards: int, epoch: int,
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shard, pos_in_shard) for one training epoch.

    Exactly one shuffle (the per-shard window); shard assignment and
    the sort key are scan-fused projections. Different epochs produce
    different permutations from the same code path — no state, no RNG.
    """
    key = epoch_key(id_col, epoch)
    w = (Window.partitionBy("shard")
         .orderBy(F.col("shuffle_key"), F.col(id_col)))
    return (docs
            .select(F.col(id_col),
                    key.alias("shuffle_key"),
                    (key % n_shards).cast("int").alias("shard"))
            .withColumn("pos_in_shard",
                        F.row_number().over(w).cast("long")))
