"""Deduplication operators for training-data pipelines, Spark-first.

Four tiers, each with a different cost/recall point:

* exact        — hash-groupBy on the sha256 content key (one shuffle).
* minhash_lsh  — word-shingle MinHash signatures + banded LSH; the
  entire signature/banding pipeline is Catalyst expressions (xxhash64
  inside array transforms — no Python), candidates verified with exact
  shingle Jaccard (array_intersect/array_union, also JVM-side).
  Scale shape: exact-dedup to representatives first (minhash_dedup
  default) → explode(bands) → shuffle by (band, hash) → bucket-size
  cap → within-bucket self-join; no O(n²) stage ever materializes,
  even against million-copy duplicate clusters.
* simhash      — 128-bit SimHash (two independently-seeded 64-bit
  halves; mapInArrow over the raw list buffers: one segment-reduce per
  bit position, zero per-doc Python), candidates via 4×32-bit band blocking
  (pigeonhole recall for Hamming ≤ 3, 2³² buckets per band),
  Hamming-verified, bucket-size cap available.
* embedding    — cosine near-dup via random-hyperplane LSH blocking +
  exact cosine verify (see ann.py for the generic kNN path).
"""

from __future__ import annotations

from typing import List, Optional

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import shingles, tokens


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str,
                member_ids_cap: int = 0) -> DataFrame:
    """Group identical contents; returns (rep_id, n_copies[, member_ids]).

    One hash shuffle on a 64-bit key + confirm on full text (collision
    safety) — the standard exact-dedup shape at any scale. Hot-key safe
    by default: real crawl corpora have million-copy clusters (empty
    files, licenses), so the default output is two scalars per group —
    never a collect_list. Pass ``member_ids_cap=k`` to also attach the k
    smallest member ids (rank-capped BEFORE collecting, so a task holds
    at most k ids per group).
    """
    keyed = df.withColumn("__k", F.xxhash64(F.col(text_col)))
    agg = (keyed.groupBy("__k", text_col)
           .agg(F.min(id_col).alias("rep_id"),
                F.count("*").alias("n_copies")))
    if member_ids_cap > 0:
        w = Window.partitionBy("__k", text_col).orderBy(F.col(id_col))
        topk = (keyed.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= member_ids_cap)
                .groupBy("__k", text_col)
                .agg(F.sort_array(F.collect_list(id_col)).alias("member_ids")))
        agg = agg.join(topk, ["__k", text_col])
    return agg.drop("__k", text_col)


def paragraph_dedup(df: DataFrame, text_col: str, id_col: str,
                    sep: str = "\n\n", min_chars: int = 1,
                    out_col: str = "clean_text") -> DataFrame:
    """CCNet-style paragraph-level dedup: drop every corpus-wide
    repeated paragraph except its FIRST occurrence (min (id, pos)),
    and reassemble each document — the standard middle tier between
    document-level ``exact_dedup`` and gram-level ``remove_dup_spans``
    (boilerplate headers/footers repeat across pages whose documents
    are NOT near-dups).

    Paragraphs shorter than ``min_chars`` are exempt (always kept):
    they are separators/headings, and deduping the empty paragraph
    would glue every document to the first one scanned.

    Shape at scale: one Generate (posexplode), ONE hash aggregate
    keyed on (xxhash64(para), para) — the exact_dedup collision-safe
    group key; a million-copy boilerplate paragraph costs each task
    one partial min — a join back on the same key (exchange reused
    under SMJ), and one groupBy(id) to reassemble. Keep-first is a
    min-struct, never a window over the full occurrence list.

    Returns the input columns plus ``out_col``, ``n_paras``,
    ``n_kept``, ``n_dropped``. Deterministic: rerun ⇒ byte-identical.
    """
    reserved = {"__id", "__pos", "__p", "__h", "__w",
                out_col, "n_paras", "n_kept", "n_dropped"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with paragraph_dedup "
                         f"internals/outputs: {sorted(clash)}")
    id_c, txt = F.col(id_col), F.col(text_col)
    # F.split takes a Java regex — escape the separator so "\n\n" and
    # friends split literally
    paras = F.split(txt, re.escape(sep), -1)
    exploded = (df.select(id_c.alias("__id"),
                          F.posexplode(paras).alias("__pos", "__p")))
    elig = exploded.where(F.length("__p") >= min_chars)
    short = exploded.where(F.length("__p") < min_chars)
    keyed = elig.withColumn("__h", F.xxhash64(F.col("__p")))
    winners = (keyed.groupBy("__h", "__p")
               .agg(F.min(F.struct("__id", "__pos")).alias("__w")))
    kept_elig = (keyed.join(winners, ["__h", "__p"])
                 .where(F.struct("__id", "__pos") == F.col("__w"))
                 .select("__id", "__pos", "__p"))
    kept = kept_elig.unionByName(short.select("__id", "__pos", "__p"))
    rebuilt = (kept.groupBy("__id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("__pos", "__p"))),
                            lambda s: s["__p"]),
                        sep).alias(out_col),
                    F.count("*").alias("n_kept")))
    base = df.withColumn("n_paras", F.size(paras).cast("long"))
    out = base.join(rebuilt, base[id_col] == rebuilt["__id"], "left")
    return (out
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
            .withColumn("n_kept", F.coalesce(F.col("n_kept"), F.lit(0))
                        .cast("long"))
            .withColumn("n_dropped", F.col("n_paras") - F.col("n_kept"))
            .drop("__id"))


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


def _cap_buckets(exploded: DataFrame, max_bucket: Optional[int]) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket`` before the self-join.

    The within-bucket self-join is Θ(Σ m_i²); one hyper-dup bucket of m
    members (every exact-dup cluster shares EVERY band) turns that into
    m² pair rows — 10¹² from a single million-copy cluster. The cap
    bounds per-bucket work at max_bucket²; dedupe exact copies first
    (``distinct_by_content``) so the cap only ever drops pathological
    buckets, and count the dropped rows via ``lsh_bucket_stats`` when a
    drop metric is needed. The count window shuffles on the same
    (band, bh) key the join needs, so it adds no extra exchange of the
    big relation.
    """
    if max_bucket is None:
        return exploded
    # The count-window partitions on the SAME (band, bh) key the
    # downstream self-join shuffles on, so at scale (sort-merge join)
    # the window's exchange is reused as the join-side exchange — the
    # cap is shuffle-free (plan-audited, tools/explain_plans.py
    # check 12). Under a broadcast join plan (small data, AQE) the
    # window pays one exchange of the slim (id, band, bh) relation —
    # irrelevant at the scale where the cap matters.
    w = Window.partitionBy("band", "bh")
    return (exploded.withColumn("__bn", F.count("*").over(w))
            .where(F.col("__bn") <= max_bucket).drop("__bn"))


def lsh_bucket_stats(exploded: DataFrame,
                     max_bucket: Optional[int] = None) -> DataFrame:
    """(n_buckets, max_bucket_size, n_rows_dropped) for a (band, bh)
    exploded relation — the logged drop metric for capped candidate
    generation."""
    per = exploded.groupBy("band", "bh").agg(F.count("*").alias("m"))
    dropped = (F.sum(F.when(F.col("m") > max_bucket, F.col("m"))
                     .otherwise(F.lit(0)))
               if max_bucket is not None else F.lit(0))
    return per.agg(F.count("*").alias("n_buckets"),
                   F.max("m").alias("max_bucket_size"),
                   dropped.cast("long").alias("n_rows_dropped"))


def minhash_lsh_candidates(df: DataFrame, text_col: str, id_col: str,
                           num_hashes: int = 64, bands: int = 16,
                           shingle_k: int = 5,
                           max_bucket: Optional[int] = None) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, n_bands_hit).

    r = num_hashes/bands rows per band → candidate threshold ≈
    (1/bands)^(1/r). With 64/16 → r=4, s* ≈ 0.5.

    ``max_bucket`` caps the within-bucket self-join (see _cap_buckets);
    at corpus scale always run exact dedup first and set a cap.
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
    exploded = _cap_buckets(exploded, max_bucket)
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
                  bands: int = 16, shingle_k: int = 5,
                  dedup_first: bool = True,
                  max_bucket: Optional[int] = None) -> DataFrame:
    """End-to-end near-dup pairs: LSH candidates → exact Jaccard verify.

    ``dedup_first`` (default) collapses exact-duplicate contents to
    their min-id representative BEFORE LSH — an m-copy cluster would
    otherwise share every band and emit m²·bands candidate rows. Pairs
    are therefore between representatives; recover the full clusters by
    composing with ``exact_dedup`` (copies of a rep near-dup everything
    their rep does). ``dedup_first=False`` restores raw all-rows pairs
    for small corpora.
    """
    base = distinct_by_content(df, text_col, id_col) if dedup_first else df
    cands = minhash_lsh_candidates(base, text_col, id_col, num_hashes, bands,
                                   shingle_k, max_bucket)
    return jaccard_verify(base, cands, text_col, id_col, threshold, shingle_k)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for oracle-checkable small blocks)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        block_col: Optional[str] = None,
                        threshold: float = 0.5, shingle_k: int = 3,
                        max_block_rows: Optional[int] = 100_000) -> DataFrame:
    """Exact all-pairs shingle Jaccard within blocks (block_col limits the
    quadratic term; None = global, only for small inputs).

    ``max_block_rows`` guards the quadratic term: blocks larger than it
    are DROPPED before the self-join (same count-window-on-the-join-key
    pattern as ``_cap_buckets`` — no extra exchange of the big relation
    under a sort-merge plan). Without the guard, a corpus-scale block —
    e.g. blocking on ``lang`` at 10⁹ docs — silently cartesians. Pass
    ``None`` to disable for known-small inputs; use ``minhash_near_dups``
    when blocks can't be bounded.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
        F.array_distinct(shingles(text_col, shingle_k)).alias("sh"))
    if max_block_rows is not None:
        w = Window.partitionBy("blk")
        sh = (sh.withColumn("__bn", F.count("*").over(w))
              .where(F.col("__bn") <= max_block_rows).drop("__bn"))
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

def _simhash_segments(vals: np.ndarray, offs: np.ndarray,
                      valid: Optional[np.ndarray]) -> np.ndarray:
    """64-bit SimHash for n documents given their token hashes as ONE
    flat int64 array + Arrow-style list offsets (len n+1, absolute into
    ``vals``). Fully vectorized across documents: per-bit majority votes
    are a single segment-reduce (``np.add.reduceat``) per bit position —
    the only Python loop is the 64 fixed bit positions, never the docs.
    (The previous kernel iterated docs in Python with a bit-matrix per
    doc; its ~µs/doc dispatch dominated the signature stage at 10⁹+
    docs. This one measured ≥4× faster at 10⁵ docs — BENCH/BASELINE.md.)

    Majority rule: bit set iff 2·count(bit) > n_tokens (ties → 0), so
    output is bit-identical to the old kernel. Empty / null docs → 0.
    """
    n = len(offs) - 1
    out = np.zeros(n, dtype=np.int64)
    seglens = (offs[1:] - offs[:-1]).astype(np.int64)
    if n == 0 or len(vals) == 0 or seglens.max() <= 0:
        return out
    # One zero sentinel after the last referenced element keeps every
    # reduceat start index in-bounds WITHOUT clamping: a trailing empty
    # doc has start == offs[-1], and clamping it to len-1 (the previous
    # version) truncated the PRECEDING doc's segment by its final token
    # — silently changing that doc's simhash whenever a batch ended
    # with an empty/null doc. The sentinel contributes 0 to every bit
    # count, so the genuine last segment ([offs[n-1], end)) is unharmed.
    flat = np.concatenate(
        [vals.view(np.uint64)[:int(offs[-1])], np.zeros(1, np.uint64)])
    starts = offs[:-1].astype(np.intp)
    # reduceat quirk: an empty segment (start_i == start_{i+1}) yields
    # flat[start_i], not 0 — masked out below via seglens == 0
    tmp = np.empty_like(flat)
    countsT = np.empty((64, n), dtype=np.uint64)
    one = np.uint64(1)
    for b in range(64):             # 64 fixed iterations, not per-doc
        np.right_shift(flat, np.uint64(b), out=tmp)
        np.bitwise_and(tmp, one, out=tmp)
        np.add.reduceat(tmp, starts, out=countsT[b])
    maj = countsT.view(np.int64) * 2 > seglens[None, :]   # ±1 votes
    bitw = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    sims = (maj.astype(np.uint64) * bitw[:, None]).sum(axis=0,
                                                       dtype=np.uint64)
    sims[seglens <= 0] = 0
    if valid is not None:
        sims[~valid] = 0            # null docs → 0, like the old UDF
    return sims.view(np.int64)


def _simhash_list_array(col) -> "np.ndarray":
    """SimHash a pyarrow ListArray<int64> column (zero per-doc Python:
    offsets/values come straight from the Arrow buffers)."""
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = col.values.to_numpy(zero_copy_only=False)
    valid = (col.is_valid().to_numpy(zero_copy_only=False)
             if col.null_count else None)
    return _simhash_segments(np.ascontiguousarray(vals, dtype=np.int64),
                             offs, valid)


def _simhash_map(src: DataFrame, hash_cols: List[str],
                 out_names: List[str]) -> DataFrame:
    """mapInArrow over (id, *array<long> cols) → (id, *simhash longs)."""
    import pyarrow as pa
    id_type = src.schema["id"].dataType.simpleString()
    n_hash = len(hash_cols)

    def _batches(it):
        for batch in it:
            sims = [pa.array(_simhash_list_array(batch.column(1 + j)),
                             type=pa.int64()) for j in range(n_hash)]
            yield pa.RecordBatch.from_arrays([batch.column(0), *sims],
                                             ["id", *out_names])

    schema = f"id {id_type}, " + ", ".join(f"{c} long" for c in out_names)
    return src.mapInArrow(_batches, schema)


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash long) — token hashes computed JVM-side first."""
    th = F.transform(tokens(text_col), lambda t: F.xxhash64(t))
    src = df.select(F.col(id_col).alias("id"), th.alias("th"))
    return _simhash_map(src, ["th"], ["simhash"])


def simhash128(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, sim_lo, sim_hi): a 128-bit SimHash as two independent 64-bit
    halves (token hashes under different xxhash64 seeds)."""
    th0 = F.transform(tokens(text_col), lambda t: F.xxhash64(t))
    th1 = F.transform(tokens(text_col), lambda t: F.xxhash64(t, F.lit(1)))
    src = df.select(F.col(id_col).alias("id"), th0.alias("th0"),
                    th1.alias("th1"))
    return _simhash_map(src, ["th0", "th1"], ["sim_lo", "sim_hi"])


def simhash_candidates(df: DataFrame, text_col: str, id_col: str,
                       max_hamming: int = 3,
                       max_bucket: Optional[int] = None) -> DataFrame:
    """Near-dup candidate pairs over a 128-bit SimHash, blocked on
    4×32-bit bands: any pair within Hamming distance ≤3 (of 128) shares
    ≥1 exact 32-bit band (pigeonhole), then Hamming is verified JVM-side
    via bit_count. 32-bit bands give up to 2³² buckets per band — the
    within-bucket self-join stays Θ(n²/2³²) per band at corpus scale
    (the old 16-bit bands capped at 65 536 buckets → Θ(n²/65k), a
    scale-killer at 10⁹ docs). max_hamming > 3 still works but recall
    beyond 3 is best-effort. ``max_bucket`` additionally caps bucket
    size (see _cap_buckets); dedupe exact copies first.
    """
    sh = simhash128(df, text_col, id_col)
    m32 = F.lit(0xFFFFFFFF)
    bands = F.array(
        F.struct(F.lit(0).alias("band"),
                 F.col("sim_lo").bitwiseAND(m32).alias("bh")),
        F.struct(F.lit(1).alias("band"),
                 F.shiftrightunsigned(F.col("sim_lo"), 32).alias("bh")),
        F.struct(F.lit(2).alias("band"),
                 F.col("sim_hi").bitwiseAND(m32).alias("bh")),
        F.struct(F.lit(3).alias("band"),
                 F.shiftrightunsigned(F.col("sim_hi"), 32).alias("bh")),
    )
    e = sh.select("id", "sim_lo", "sim_hi", F.explode(bands).alias("b")) \
          .select("id", "sim_lo", "sim_hi", "b.band", "b.bh")
    e = _cap_buckets(e, max_bucket)
    l, r = e.alias("l"), e.alias("r")
    hamming = (
        F.bit_count(F.col("l.sim_lo").bitwiseXOR(F.col("r.sim_lo")))
        + F.bit_count(F.col("l.sim_hi").bitwiseXOR(F.col("r.sim_hi"))))
    pairs = (l.join(r, ["band", "bh"])
             .where(F.col("l.id") < F.col("r.id"))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                     hamming.alias("hamming"))
             .dropDuplicates(["id_a", "id_b"])
             .where(F.col("hamming") <= max_hamming))
    return pairs


# ---------------------------------------------------------------------------
# span-level dedup — repeated g-gram spans, first occurrence kept
# ---------------------------------------------------------------------------

def _positioned_grams(df: DataFrame, text_col: str, id_col: str,
                      g: int):
    """-> (base, grams): base = (id, n_tokens, t array) for docs with
    ≥1 token; grams = (id, n_tokens, pos, h) with 1-based token
    position and xxhash64 of each g-token gram (short docs yield one
    truncated gram — their whole text — so span dedup degrades to
    exact dedup for them, never silence). The token array is a bound
    attribute, not a re-evaluated expression, so the split runs once
    per row (the shingles() let-binding lesson)."""
    base = (df.select(F.col(id_col).alias("id"),
                      tokens(text_col).alias("t"))
            .withColumn("n_tokens", F.size("t"))
            .where(F.col("n_tokens") > 0))
    win = F.transform(
        F.sequence(F.lit(1),
                   F.greatest(F.col("n_tokens") - (g - 1), F.lit(1))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice("t", i, g))))
    grams = (base.select("id", "n_tokens",
                         F.posexplode(win).alias("j", "h"))
             .select("id", "n_tokens", (F.col("j") + 1).alias("pos"),
                     "h"))
    return base, grams


def _dup_occurrences(grams: DataFrame, min_count: int) -> DataFrame:
    """Occurrences of globally-repeated grams MINUS each gram's first
    occurrence (min (id, pos) corpus-wide — the copy that is kept).
    One groupBy on the 8-byte gram hash computes count and argmin
    together (map-side partial; an extra pass per statistic would
    rescan the gram relation); the join back is many-to-one on h, so a
    boilerplate gram repeated 10⁹ times inflates one probe partition,
    not the build side — AQE skew-join splits it."""
    info = (grams.groupBy("h")
            .agg(F.count("*").alias("n_occ"),
                 F.min(F.struct("id", "pos")).alias("first")))
    return (grams.join(info.where(F.col("n_occ") >= min_count), "h")
            .where(~((F.col("id") == F.col("first.id"))
                     & (F.col("pos") == F.col("first.pos"))))
            .drop("n_occ", "first"))


def _span_end(g: int):
    return F.least(F.col("pos") + (g - 1), F.col("n_tokens"))


def _merged_spans(dup: DataFrame, g: int) -> DataFrame:
    """Merge overlapping/adjacent duplicated g-gram intervals per doc
    into disjoint islands: (id, n_tokens, start, end, n_grams) via
    gaps-and-islands over ONE id-keyed window (the id exchange the
    per-doc agg needs anyway; the two groupBys after it are
    exchange-free because hash-partitioning on id satisfies their
    clustering). This bounds all downstream per-doc work by the number
    of DISJOINT duplicated regions: a fully-duplicated 50k-token doc
    is ONE island, not 50k intervals — without the merge,
    remove_dup_spans' per-token coverage check is O(n_tokens ·
    n_occurrences) = 2.5e9 lambda evals for that single row."""
    prev_end = F.max("end").over(
        Window.partitionBy("id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1))
    run = (dup.select("id", "n_tokens", "pos", _span_end(g).alias("end"))
           .withColumn("new_isl",
                       (F.col("pos")
                        > F.coalesce(prev_end + 1, F.lit(0))).cast("int"))
           .withColumn("isl", F.sum("new_isl").over(
               Window.partitionBy("id").orderBy("pos")
               .rowsBetween(Window.unboundedPreceding, 0))))
    return (run.groupBy("id", "n_tokens", "isl")
            .agg(F.min("pos").alias("start"), F.max("end").alias("end"),
                 F.count("*").alias("n_grams"))
            .drop("isl"))


def dup_span_stats(df: DataFrame, text_col: str, id_col: str,
                   g: int = 8, min_count: int = 2) -> DataFrame:
    """Per-document repeated-span statistics (the span-level third
    granularity next to exact and near-dup DOCUMENT dedup): a span is
    a g-token gram whose text occurs ≥ min_count times corpus-wide;
    the globally-first occurrence (min (id, pos)) is not counted — it
    is the copy a remover keeps, so a corpus of n identical docs
    scores n−1 fully-duplicated docs, not n [Lee et al., ACL 2022,
    "Deduplicating Training Data Makes Language Models Better" —
    substring dedup semantics, g-gram approximation].

    Returns (id, n_tokens, n_dup_grams, dup_tokens, dup_frac) for
    every doc with ≥1 token: dup_tokens is the INTERVAL-UNION size of
    the duplicated spans (overlapping grams don't double-count) —
    the occurrences are merged into disjoint islands first
    (:func:`_merged_spans`), so the union is a plain SUM of island
    sizes and no per-doc position array is ever materialized (a
    fully-duplicated mega-doc would otherwise collect its whole
    position list into one aggregation buffer). dup_frac =
    dup_tokens/n_tokens is a ratio of exact ints (cross-engine
    bit-identical).

    Scale shape: one groupBy on the 8-byte gram hash, one join back,
    one id-keyed window + exchange-free aggs — positions travel as
    ints; nothing is collected driver-side."""
    base, grams = _positioned_grams(df, text_col, id_col, g)
    dup = _dup_occurrences(grams, min_count)
    per_doc = (_merged_spans(dup, g)
               .groupBy("id")
               .agg(F.sum("n_grams").alias("n_dup_grams"),
                    F.sum(F.col("end") - F.col("start") + 1)
                    .alias("dup_tokens")))
    return (base.select("id", "n_tokens")
            .join(per_doc, "id", "left")
            .select("id", "n_tokens",
                    F.coalesce("n_dup_grams", F.lit(0))
                    .cast("long").alias("n_dup_grams"),
                    F.coalesce("dup_tokens", F.lit(0))
                    .cast("long").alias("dup_tokens"))
            .withColumn("dup_frac",
                        F.col("dup_tokens") / F.col("n_tokens")))


def remove_dup_spans(df: DataFrame, text_col: str, id_col: str,
                     g: int = 8, min_count: int = 2) -> DataFrame:
    """Rewrite each document with its duplicated spans REMOVED (the
    trim counterpart of :func:`dup_span_stats`, same span definition,
    same first-occurrence-kept rule — re-running on its own output is
    a fixpoint for fully-duplicated docs). Returns
    (id, clean_text, n_tokens, dup_tokens): clean_text is the
    surviving tokens joined by single spaces (whitespace is
    normalized — the tokenizer already collapses runs), so
    len(split(clean_text)) == n_tokens - dup_tokens by construction.

    The rewrite is pure Catalyst: per doc the duplicated intervals
    arrive MERGED into disjoint islands (:func:`_merged_spans`) as an
    array of (pos, end) structs and each token position is kept iff
    no island covers it — O(n_tokens · n_islands) per row with
    n_islands bounded by the doc's disjoint duplicated regions (not
    its occurrence count), no Python, no second text scan."""
    base, grams = _positioned_grams(df, text_col, id_col, g)
    dup = _dup_occurrences(grams, min_count)
    ivs = (_merged_spans(dup, g)
           .select("id", F.struct(
               F.col("start").alias("pos"), F.col("end")).alias("iv"))
           .groupBy("id").agg(F.collect_list("iv").alias("ivs")))
    joined = base.join(ivs, "id", "left").withColumn(
        "ivs", F.coalesce("ivs", F.array().cast(
            "array<struct<pos:int,end:int>>")))
    kept = F.filter(
        F.sequence(F.lit(1), F.col("n_tokens")),
        lambda p: ~F.exists(
            "ivs", lambda iv: (p >= iv["pos"]) & (p <= iv["end"])))
    # dup_tokens from the DISJOINT clipped islands directly (O(islands))
    # rather than n_tokens - size(kept): codegen skips subexpression
    # elimination for lambda-bearing expressions (SPARK-35410), so a
    # second reference to `kept` would re-run the whole per-token
    # coverage scan — the dominant cost — once more per row.
    dup_toks = F.aggregate(
        "ivs", F.lit(0),
        lambda a, iv: a + (iv["end"] - iv["pos"] + 1))
    return (joined.select(
        "id",
        F.concat_ws(" ", F.transform(
            kept, lambda p: F.element_at("t", p))).alias("clean_text"),
        "n_tokens",
        dup_toks.cast("long").alias("dup_tokens")))


# ---------------------------------------------------------------------------
# cluster representatives — pairs → clusters → keep the best copy
# ---------------------------------------------------------------------------

def keep_best_per_cluster(df: DataFrame, pairs: DataFrame, id_col: str,
                          score_col: str, src: str = "id_a",
                          dst: str = "id_b",
                          stats: Optional[dict] = None) -> DataFrame:
    """The ACTION step of near-dup dedup: given pair edges from any
    candidate tier (minhash/simhash/ngram verify), cluster them
    transitively and pick ONE representative per cluster — the row with
    the highest ``score_col`` (ties broken by smallest id, so the choice
    is deterministic). Rows absent from every pair form singleton
    clusters and represent themselves.

    Returns ``df`` + ``component`` (the cluster's minimum id),
    ``cluster_size``, and ``is_rep``; filter ``is_rep`` to materialize
    the deduplicated corpus. Ids must be unique (one row per id) and
    ``score_col`` numeric; NULL scores never win (a cluster of only
    NULL scores falls back to the minimum id). Rows with a NULL id
    cannot join any cluster (SQL NULL never equi-joins): they pass
    through as singleton self-representatives with component NULL —
    never silently dropped.

    Scale shape: clustering is the O(log d) alternating-star
    :func:`~fastfilter_spark.pipeline.graph.connected_components`; the
    representative is a scalar two-phase ``groupBy(component)`` agg
    (min over a (-score, id) struct — map-side combined, so a
    million-copy cluster costs one partial per task, never a window
    sort holding the whole cluster); the flag join back is keyed on
    ``component`` (AQE skew-split absorbs giant clusters). No
    collect_list, no window over the cluster, nothing driver-side.
    ``stats`` receives the clustering round count.
    """
    from .graph import connected_components
    # Reserved working/output names: an input column called `comp`
    # would be deleted by the drop("comp") below, and a pre-existing
    # `component`/`cluster_size`/`is_rep`/`__rep` would make the
    # coalesce/joins resolve ambiguously — fail loud instead (same
    # convention as require_long_key).
    reserved = {"comp", "component", "cluster_size", "is_rep", "__rep"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"keep_best_per_cluster: input columns {clash} collide with "
            f"reserved working/output names {sorted(reserved)} — rename "
            "them before calling")
    # NULL-id rows would vanish in the final equi-join on component
    # (component stays NULL, NULL != NULL): split them off up front and
    # pass them through as singleton self-reps instead of losing rows.
    null_ids = (df.where(F.col(id_col).isNull())
                .withColumn("component",
                            F.lit(None).cast(df.schema[id_col].dataType))
                .withColumn("cluster_size", F.lit(1).cast("long"))
                .withColumn("is_rep", F.lit(True)))
    df = df.where(F.col(id_col).isNotNull())
    labels = (connected_components(pairs, src, dst, stats=stats)
              .withColumnRenamed("id", id_col))
    joined = (df.join(labels, id_col, "left")
              .withColumn("component",
                          F.coalesce(F.col("comp"), F.col(id_col)))
              .drop("comp"))
    # NULL scores map to +inf in the min-struct ordering: they lose to
    # any real score, and an all-NULL cluster degrades to min-id.
    neg = F.when(F.col(score_col).isNotNull(),
                 -F.col(score_col).cast("double")) \
           .otherwise(F.lit(float("inf")))
    best = (joined.groupBy("component")
            .agg(F.min(F.struct(neg.alias("ns"),
                                F.col(id_col).alias("i"))).alias("b"),
                 F.count("*").alias("cluster_size")))
    rep = best.select("component", F.col("b.i").alias("__rep"),
                      "cluster_size")
    out = (joined.join(rep, "component")
           .withColumn("is_rep", F.col(id_col) == F.col("__rep"))
           .drop("__rep"))
    return out.unionByName(null_ids.select(*out.columns))


def semantic_dedup(df: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   score_col: Optional[str] = None,
                   threshold: float = 0.35, method: str = "lsh",
                   n_bits: int = 64, bands: int = 8, dim: int = 64,
                   seed: int = 42, max_bucket: Optional[int] = 2000,
                   multiprobe: int = 1,
                   stats: Optional[dict] = None) -> DataFrame:
    """End-to-end embedding-level (semantic) dedup in ONE call:
    :func:`~fastfilter_spark.pipeline.ann.cosine_near_dups` pair edges
    → :func:`~fastfilter_spark.pipeline.graph.connected_components`
    → :func:`keep_best_per_cluster` — the operation a training-data
    user actually runs, previously three hand-chained calls
    (VERDICT r4 next-round #4).

    Returns ``df`` + ``component`` / ``cluster_size`` / ``is_rep``;
    filter ``is_rep`` for the deduplicated corpus. ``score_col`` picks
    the kept copy per cluster (highest wins, ties to smallest id);
    ``None`` keeps the smallest-id copy — fully deterministic either
    way. ``stats`` receives the clustering round count; edge-volume
    telemetry is ``ann.lsh_bucket_stats``-style via the pair functions.

    method='exact' is the O(n²)-scoring verify baseline (broadcast
    self-join, cosine in Catalyst); method='lsh' (default) is the
    100 TB shape: hyperplane-band candidate buckets (≥8-bit bands
    enforced, buckets capped at ``max_bucket``) then exact cosine on
    candidates only — candidate volume linear in corpus size. The
    composition adds NO exchange beyond its three components'
    (plan-audited, tools/explain_plans.py)."""
    from .ann import cosine_near_dups
    work, tmp_score = df, None
    if score_col is None:
        tmp_score = "__semantic_score"
        if tmp_score in df.columns:
            raise ValueError(f"{tmp_score} is a reserved working name")
        work = df.withColumn(tmp_score, F.lit(None).cast("double"))
        score_col = tmp_score
    pairs = cosine_near_dups(df, vec_col, id_col, threshold, method,
                             n_bits, bands, dim, seed, max_bucket,
                             multiprobe)
    out = keep_best_per_cluster(work, pairs, id_col, score_col,
                                stats=stats)
    return out.drop(tmp_score) if tmp_score else out
