"""Scale-up evidence for near-dup clustering: label propagation vs
large-star/small-star contraction.

Builds revision-chain pair graphs over a 10x-replicated sf0.01
documents corpus (5000 nodes, constant across shapes) with chain
depth swept 8 -> 512 while holding node count fixed, then records
convergence rounds + wall time for both algorithms. Expectation
(Kiveris et al.): label propagation needs O(diameter) rounds — linear
in chain depth — while star contraction needs O(log^2 n) regardless
of depth. Writes the measured table to SCALING.md.

Usage: python tools/clustering_scale.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.session import get_spark
from engagement_data_pipeline_spark.tables import load
from engagement_data_pipeline_spark.training.dedup import (
    near_dup_clusters,
    near_dup_clusters_star,
)

REPLICATION = 10
DEPTHS = [8, 32, 128, 512]


def chain_pairs(spark, doc_ids, depth: int):
    """Revision chains over the replicated corpus: node count is
    len(doc_ids)*REPLICATION for every depth — only the chain DEPTH
    (graph diameter) varies. Node id = base_doc*10000 + position."""
    n_nodes = len(doc_ids) * REPLICATION
    n_chains = n_nodes // depth
    rows = []
    for c in range(n_chains):
        base = doc_ids[c % len(doc_ids)]
        ids = [base * 10000 + c * depth + k for k in range(depth)]
        rows += [(a, b) for a, b in zip(ids, ids[1:])]
    return spark.createDataFrame(rows, "id_a long, id_b long")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    doc_ids = [r[0] for r in
               load(spark, sf_dir, "documents").select("doc_id").collect()]
    lines = [
        "# Clustering scale evidence",
        "",
        f"Pair graphs over a {REPLICATION}x replicated sf0.01 documents "
        f"corpus ({len(doc_ids) * REPLICATION} nodes in every row; only "
        "chain depth = component diameter varies).",
        "Rounds are measured via the operators' `stats` hook "
        "(training/dedup.py); wall-clock is local[32].",
        "",
        "| chain depth | plain rounds | plain wall (s) | star rounds | star wall (s) |",
        "|---|---|---|---|---|",
    ]
    for depth in DEPTHS:
        pairs = chain_pairs(spark, doc_ids, depth).cache()
        pairs.count()

        stats_p: dict = {}
        t = time.time()
        try:
            near_dup_clusters(pairs, max_iterations=depth + 2,
                              stats=stats_p).count()
            plain = (str(stats_p["rounds"]), f"{time.time() - t:.1f}")
        except RuntimeError:  # did not converge in depth+2 rounds
            plain = (f">{depth + 2}", f"{time.time() - t:.1f}")

        stats_s: dict = {}
        t = time.time()
        near_dup_clusters_star(pairs, max_iterations=30,
                               stats=stats_s).count()
        star = (str(stats_s["rounds"]), f"{time.time() - t:.1f}")
        pairs.unpersist()

        lines.append(f"| {depth} | {plain[0]} | {plain[1]} "
                     f"| {star[0]} | {star[1]} |")
        print(lines[-1], flush=True)

    lines += [
        "",
        "Reading: plain label propagation pays one round per hop of "
        "diameter — linear in chain depth, ruinous for deep revision "
        "chains — while star contraction stays ~log^2(n) rounds at "
        "EVERY depth. `near_dup_clusters_star` is therefore the "
        "100 TB default whenever component shape is unknown; the "
        "shape is pinned by test_clustering_rounds_scale_shape.",
    ]
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
