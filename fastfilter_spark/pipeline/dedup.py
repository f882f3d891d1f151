"""Deduplication operators for training-data pipelines, Spark-first.

Four tiers, each with a different cost/recall point:

* exact        — hash-groupBy on the sha256 content key (one shuffle).
* minhash_lsh  — word-shingle MinHash signatures + banded LSH; the
  entire signature/banding pipeline is Catalyst expressions (xxhash64
  inside array transforms — no Python), candidates verified with exact
  shingle Jaccard (array_intersect/array_union, also JVM-side).
  Scale shape: explode(bands) → shuffle by (band, hash) → within-bucket
  self-join; no O(n²) stage ever materializes.
* simhash      — 64-bit SimHash over token hashes (vectorized numpy in
  a pandas UDF: per-batch matrix of bit contributions), near-dup
  candidates via 4×16-bit band blocking, Hamming-verified.
* embedding    — cosine near-dup via random-hyperplane LSH blocking +
  exact cosine verify (see ann.py for the generic kNN path).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import shingles, tokens


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical contents; returns (rep_id, n_copies, member_ids).

    One hash shuffle on a 64-bit key + confirm on full text (collision
    safety) — the standard exact-dedup shape at any scale.
    """
    keyed = df.withColumn("__k", F.xxhash64(F.col(text_col)))
    return (keyed.groupBy("__k", text_col)
            .agg(F.min(id_col).alias("rep_id"),
                 F.count("*").alias("n_copies"),
                 F.sort_array(F.collect_list(id_col)).alias("member_ids"))
            .drop("__k", text_col))


def distinct_by_content(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative row per distinct content (min id wins)."""
    w = Window.partitionBy(F.xxhash64(F.col(text_col)), F.col(text_col)) \
              .orderBy(F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1").drop("__rn"))


# ---------------------------------------------------------------------------
# MinHash + banded LSH — all JVM-side
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       num_hashes: int = 64, shingle_k: int = 5) -> DataFrame:
    """(id, sig array<long>) MinHash signatures.

    Shape matters: explode shingles once, then ONE hash-aggregate with
    num_hashes `min(xxhash64(s, i))` columns — a single shuffle with
    map-side partial mins, all codegen'd. (A per-row Column of 64
    array_min(transform(...)) duplicates the shingle expression 64× in
    the plan and blows up codegen — measured, not theoretical.)
    """
    sh = df.select(F.col(id_col).alias("id"),
                   F.explode(F.array_distinct(shingles(text_col, shingle_k)))
                   .alias("s"))
    aggs = [F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(df: DataFrame, text_col: str, id_col: str,
                           num_hashes: int = 64, bands: int = 16,
                           shingle_k: int = 5) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, n_bands_hit).

    r = num_hashes/bands rows per band → candidate threshold ≈
    (1/bands)^(1/r). With 64/16 → r=4, s* ≈ 0.5.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    band_cols = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
                 .alias("bh"))
        for b in range(bands)
    ])
    exploded = (sig.select("id", F.explode(band_cols).alias("b"))
                .select("id", "b.band", "b.bh"))
    # within-bucket self-join; bucket sizes are bounded in practice, and
    # the shuffle key (band, bh) spreads uniformly
    left = exploded.alias("l")
    right = exploded.alias("r")
    pairs = (left.join(right, ["band", "bh"])
             .where(F.col("l.id") < F.col("r.id"))
             .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
             .agg(F.count("*").alias("n_bands_hit")))
    return pairs


def jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str,
                   id_col: str, threshold: float = 0.7,
                   shingle_k: int = 5) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs — JVM array ops."""
    sh = df.select(F.col(id_col).alias("id"),
                   F.array_distinct(shingles(text_col, shingle_k)).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    out = (pairs
           .join(a, pairs.id_a == F.col("a.id"))
           .join(b, pairs.id_b == F.col("b.id"))
           .withColumn("inter", F.size(F.array_intersect("a.sh", "b.sh")))
           .withColumn("uni", F.size(F.array_union("a.sh", "b.sh")))
           .withColumn("jaccard", F.col("inter") / F.greatest("uni", F.lit(1)))
           .select("id_a", "id_b", "n_bands_hit", "jaccard")
           .where(F.col("jaccard") >= threshold))
    return out


def minhash_dedup(df: DataFrame, text_col: str, id_col: str,
                  threshold: float = 0.7, num_hashes: int = 64,
                  bands: int = 16, shingle_k: int = 5) -> DataFrame:
    """End-to-end near-dup pairs: LSH candidates → exact Jaccard verify."""
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands,
                                   shingle_k)
    return jaccard_verify(df, cands, text_col, id_col, threshold, shingle_k)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for oracle-checkable small blocks)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        block_col: Optional[str] = None,
                        threshold: float = 0.5, shingle_k: int = 3) -> DataFrame:
    """Exact all-pairs shingle Jaccard within blocks (block_col limits the
    quadratic term; None = global, only for small inputs)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
        F.array_distinct(shingles(text_col, shingle_k)).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    return (a.join(b, "blk")
            .where(F.col("a.id") < F.col("b.id"))
            .withColumn("inter", F.size(F.array_intersect("a.sh", "b.sh")))
            .withColumn("uni", F.size(F.array_union("a.sh", "b.sh")))
            .withColumn("jaccard", F.col("inter") / F.greatest("uni", F.lit(1)))
            .where(F.col("jaccard") >= threshold)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    "jaccard"))


# ---------------------------------------------------------------------------
# SimHash — vectorized pandas UDF + band blocking
# ---------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def _simhash64(token_hashes: pd.Series) -> pd.Series:
    """64-bit SimHash from an array<long> column of token hashes.

    Per batch: unpack each doc's hash list, accumulate ±1 per bit with a
    numpy bit-matrix — C-speed, no per-token Python.
    """
    out = np.zeros(len(token_hashes), dtype=np.int64)
    bitw = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for i, hs in enumerate(token_hashes):
        if hs is None or len(hs) == 0:
            continue
        h = np.asarray(hs, dtype=np.int64).view(np.uint64)
        bits = ((h[:, None] & bitw[None, :]) != 0)
        score = bits.sum(axis=0) * 2 - len(h)   # (+1/-1 votes per bit)
        sim = np.uint64(0)
        sim = (bitw[score > 0]).sum(dtype=np.uint64)
        out[i] = np.int64(sim.astype(np.uint64).view(np.int64))
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash long) — token hashes computed JVM-side first."""
    th = F.transform(tokens(text_col), lambda t: F.xxhash64(t))
    return df.select(F.col(id_col).alias("id"),
                     _simhash64(th).alias("simhash"))


def simhash_candidates(df: DataFrame, text_col: str, id_col: str,
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup candidate pairs: block on 4×16-bit simhash bands (any
    pair within Hamming distance ≤3 of a 64-bit hash shares ≥1 exact
    16-bit band), then verify Hamming distance JVM-side via bit_count."""
    sh = simhash(df, text_col, id_col)
    bands = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftrightunsigned(F.col("simhash"), 16 * b)
                 .bitwiseAND(F.lit(0xFFFF)).alias("bh"))
        for b in range(4)
    ])
    e = sh.select("id", "simhash", F.explode(bands).alias("b")) \
          .select("id", "simhash", "b.band", "b.bh")
    l, r = e.alias("l"), e.alias("r")
    pairs = (l.join(r, ["band", "bh"])
             .where(F.col("l.id") < F.col("r.id"))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                     F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
                     .alias("hamming"))
             .dropDuplicates(["id_a", "id_b"])
             .where(F.col("hamming") <= max_hamming))
    return pairs
