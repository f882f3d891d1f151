"""Benchmark decontamination: flag training documents that share
n-grams with a (much smaller) evaluation/benchmark corpus.

The canonical composition of this library's two halves: the benchmark
side's shingles build a binary-fuse filter (tiny, broadcastable — a few
MB covers millions of benchmark n-grams), the training side's shingles
probe it as a DataFrame predicate, and only the ε-fraction of candidate
hits pays an exact confirm join against the (broadcast) benchmark
shingles — so the result is EXACT (zero FN from the filter, FP
candidates removed by the confirm) while the heavy training relation is
pruned by the filter before any join. At 100 TB the training side is a
pure scan + filter probe; nothing proportional to |train|·|bench| ever
materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles


def contamination_flags(train: DataFrame, bench: DataFrame, text_col: str,
                        id_col: str, shingle_k: int = 8, min_hits: int = 2,
                        kind: str = "bf16",
                        num_partitions: int = 8) -> DataFrame:
    """(id, n_shingles, n_hits, contaminated) per TRAINING doc.

    ``n_hits`` = exact count of the doc's distinct ``shingle_k``-grams
    that appear anywhere in ``bench``; ``contaminated`` ⇔ n_hits ≥
    ``min_hits``. The filter prunes the exploded training shingles
    (expected pass rate = true-hit rate + 2^-w) before the exact
    confirm semi-join against the broadcast benchmark shingle set.
    """
    from ..spark.build import build_partitioned_filter

    bsh = (bench.select(F.explode(
               F.array_distinct(shingles(text_col, shingle_k))).alias("sh"))
           .distinct())
    pf = build_partitioned_filter(
        bsh.select(F.xxhash64("sh").alias("key")), kind=kind,
        num_partitions=num_partitions)

    dsh = (train.select(F.col(id_col).alias("id"),
                        F.explode(F.array_distinct(
                            shingles(text_col, shingle_k))).alias("sh"))
           .withColumn("key", F.xxhash64("sh")))
    cand = (pf.with_contains(dsh, "key")
            .where("contained").drop("key", "contained"))
    # exact confirm: FP candidates (ε = 2^-w of the clean shingles)
    # vanish here; the join is a broadcast of the SMALL benchmark side
    hits = (cand.join(F.broadcast(bsh), "sh", "left_semi")
            .groupBy("id").agg(F.count("*").alias("n_hits")))

    per_doc = train.select(
        F.col(id_col).alias("id"),
        F.size(F.array_distinct(shingles(text_col, shingle_k)))
        .alias("n_shingles"))
    return (per_doc.join(hits, "id", "left")
            .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
            .withColumn("contaminated", F.col("n_hits") >= min_hits))
