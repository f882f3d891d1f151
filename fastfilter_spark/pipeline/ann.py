"""Approximate nearest neighbour search over embedding columns.

Two paths:

* brute_force_topk — exact cosine top-k. The dot products run in an
  Arrow-native `mapInArrow` kernel as one numpy matmul per batch
  against a broadcast query matrix (this beats per-row
  F.aggregate/zip_with by an order of magnitude and stays off the
  driver). Scales linearly in corpus size: fine as the baseline /
  verify stage.
* lsh_topk — random-hyperplane LSH: m-bit signatures via the same
  batched matmul, candidates blocked on signature bands, exact cosine
  re-rank of candidates only. The scale path: shuffle moves only
  (band, sig) buckets, never the cross product. Bands are ≥8 bits
  each (enforced — narrower bands make the within-bucket self-join a
  disguised cartesian: 4-bit bands = 16 buckets = Θ(n²/16)), recall
  is recovered with MULTI-PROBE (each query also probes the
  Hamming-1 neighbor buckets of its band hash — Lv et al. 2007)
  instead of coarser buckets, and oversized buckets are dropped by
  the same ``_cap_buckets`` guard the dedup paths use, which makes
  worst-case candidate volume LINEAR in corpus size
  (≤ n·bands·(1+band_bits)·max_bucket) instead of quadratic.
* ivf_topk — IVF (inverted-file) coarse quantizer: spherical k-means
  centroids (driver-sample trained for small cell counts,
  ``train_ivf_centroids_distributed`` for the 10³–10⁵ cells a
  10⁹-vector corpus needs), every corpus vector assigned to its
  nearest cell as a JVM-filterable `cell` column, queries probe only
  their `nprobe` nearest cells. The alternative scale path: with the
  corpus written partitioned-by-cell, the `cell IN (...)` predicate
  becomes partition pruning and a probe touches nprobe/n_cells of
  the data — and the scoring kernel matmuls only the queries that
  probed each batch's cells, so compute shrinks by the same factor.
* ivfpq_topk_from_index — IVF-PQ ([PQ11]): the persisted index stores
  m uint8 product-quantization codes per vector instead of the float
  array, so a probe reads nprobe/n_cells of the corpus AND ~m/(4·dim)
  of the bytes per row; scoring is table-lookup ADC with an optional
  exact re-rank stage (refine_with) that restores recall from the
  tiny candidate set.
* cosine_near_dups — embedding-cosine near-duplicate pairs. Exact
  mode keeps the whole cosine in Catalyst (zip_with/aggregate fold,
  no Python in the hot path) over a broadcast self-join — the verify
  stage; LSH mode pre-filters candidates by signature bands first —
  the 100 TB stage.

Vectors are `array<float>` columns; norms are precomputed JVM-side.

Every Python kernel here is `mapInArrow` over the raw Arrow buffers —
`_list_matrix` turns a ListArray<float> column into an (n, dim)
float64 matrix with zero per-row Python (the `dedup._simhash_list_array`
idiom; VERDICT r4 #2 measured the old per-row `np.vstack`
comprehension as the ANN hot-path tax).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _list_matrix(col, dim: int) -> np.ndarray:
    """(n, dim) float64 matrix from a pyarrow List/LargeList column
    with zero per-row Python: offsets/values come straight from the
    Arrow buffers and the common all-rows-regular case is ONE
    astype + reshape. Null rows become zero vectors (the contract the
    old per-row helper had); a non-null row of the wrong length
    raises — silently zeroing real data would corrupt similarity
    results."""
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = np.asarray(col.values.to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    n = len(offs) - 1
    lens = np.diff(offs)
    valid = (col.is_valid().to_numpy(zero_copy_only=False)
             if col.null_count else None)
    good = lens == dim
    bad = ~good if valid is None else (~good & valid)
    if bad.any():
        i = int(np.nonzero(bad)[0][0])
        raise ValueError(
            f"embedding length {int(lens[i])} != dim {dim} at batch row {i}")
    if valid is None and n:
        # all rows present and regular: zero-copy view + reshape
        return vals[offs[0]:offs[-1]].reshape(n, dim)
    out = np.zeros((n, dim), dtype=np.float64)
    rows = np.nonzero(good if valid is None else (good & valid))[0]
    if len(rows):
        idx = offs[:-1][rows, None] + np.arange(dim, dtype=np.int64)[None, :]
        out[rows] = vals[idx]
    return out


def _i64(col) -> np.ndarray:
    """int64 numpy view of an Arrow integer column (partition columns
    can arrive dictionary-encoded from the parquet scan)."""
    import pyarrow as pa
    if pa.types.is_dictionary(col.type):
        col = col.cast(col.type.value_type)
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _partial_topk(sims: np.ndarray, cids: np.ndarray, m: int):
    """Per-batch partial top-k reduction: for each query column j keep
    the m best candidates by the FINAL global order (cos desc,
    neighbor_id asc — lexsort gives the exact tie-break, so results
    stay bit-identical to the unreduced plan). Returns (bi, qi) index
    arrays into (cids, columns). This is the map-side combine of the
    top-k aggregation: the window exchange then carries ≤ P·nq·m rows
    instead of n·nq (at 1e9 corpus rows × 100 queries the unreduced
    shuffle is 1e11 rows — the whole point of reducing here)."""
    bi_parts, qi_parts = [], []
    for j in range(sims.shape[1]):
        s = sims[:, j]
        if len(s) > m:
            # O(n) argpartition to the top-m by value, then lexsort only
            # the boundary-tied candidate set (a full per-query lexsort
            # of the batch was O(n log n) × nq). Ties at the m-th value
            # must ALL enter the candidate set: argpartition splits
            # equal-to-pivot rows arbitrarily, and dropping one with a
            # smaller id would break the (cos desc, id asc) bit-identity
            # with the final window. -inf rows are masked non-results
            # (ivf_topk) and can never be returned — when the m-th value
            # is -inf (a query whose probed cells contribute < m rows to
            # this batch), select the finite rows directly instead of
            # letting `s >= -inf` sweep the whole batch back into the
            # lexsort.
            v = s[np.argpartition(-s, m - 1)[:m]].min()
            if v == -np.inf:
                sel = np.nonzero(s > -np.inf)[0]
                if len(sel) > 1:
                    sel = sel[np.lexsort((cids[sel], -s[sel]))[:m]]
            else:
                cand = np.nonzero(s >= v)[0]
                sel = cand[np.lexsort((cids[cand], -s[cand]))[:m]]
        else:
            sel = np.arange(len(s))
        bi_parts.append(sel)
        qi_parts.append(np.full(len(sel), j, dtype=np.int64))
    if not bi_parts:
        return (np.empty(0, dtype=np.int64),) * 2
    return np.concatenate(bi_parts), np.concatenate(qi_parts)


def _topk_batch(qids_b, qi, cids, bi, sims_bq):
    """RecordBatch in the shared (query_id, neighbor_id, cos_sim)
    scored-pair schema."""
    import pyarrow as pa
    return pa.RecordBatch.from_arrays(
        [pa.array(qids_b[qi], type=pa.int64()),
         pa.array(cids[bi], type=pa.int64()),
         pa.array(sims_bq, type=pa.float64())],
        ["query_id", "neighbor_id", "cos_sim"])


def brute_force_topk(corpus: DataFrame, queries: DataFrame,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     k: int = 5, exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    queries is collected to a broadcast matrix (queries are the small
    side by design — for all-pairs use lsh_topk). Each Arrow batch
    emits only its PARTIAL top-(k+1) per query (``_partial_topk``), so
    the window exchange carries P·nq·(k+1) rows, not n·nq — results
    are bit-identical (a global top-k element is within the top k+1 of
    its own batch even before the self row is excluded).
    """
    spark = corpus.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.vstack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0
    dim = qmat.shape[1]
    bc = spark.sparkContext.broadcast((qids, qmat / qnorm[:, None]))

    out_schema = "query_id long, neighbor_id long, cos_sim double"
    # self rows are filtered AFTER the partial reduction, so keep one
    # extra slot per batch — the self row can displace at most one
    m = k + (1 if exclude_self else 0)

    def _score(batches):
        qids_b, qn = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cmat = _list_matrix(batch.column(1), dim)
            cnorm = np.linalg.norm(cmat, axis=1)
            cnorm[cnorm == 0] = 1.0
            sims = (cmat / cnorm[:, None]) @ qn.T      # (batch, nq)
            # corrupt vectors (NaN/inf components — dirty data is a
            # given at corpus scale) give non-finite sims; Spark ranks
            # NaN ABOVE every double in a desc window, so unsanitized
            # they'd become the rank-1 neighbor of every query — and
            # whether the small-batch path emitted them would depend on
            # Arrow batch boundaries. Mask to -inf (deterministically
            # last) and drop below.
            sims = np.where(np.isfinite(sims), sims, -np.inf)
            cids = _i64(batch.column(0))
            bi, qi = _partial_topk(sims, cids, m)
            fin = np.isfinite(sims[bi, qi])
            bi, qi = bi[fin], qi[fin]
            yield _topk_batch(qids_b, qi, cids, bi, sims[bi, qi])

    scored = corpus.select(id_col, vec_col).mapInArrow(_score, out_schema)
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def hyperplane_signatures(df: DataFrame, vec_col: str, id_col: str,
                          n_bits: int = 32, dim: int = 64,
                          seed: int = 42) -> DataFrame:
    """(id, sig long): sign pattern of `n_bits` random hyperplanes."""
    spark = df.sparkSession
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))
    bc = spark.sparkContext.broadcast(planes)
    id_type = df.schema[id_col].dataType.simpleString()

    def _sig(batches):
        import pyarrow as pa
        pl = bc.value
        weights = (1 << np.arange(pl.shape[1], dtype=np.int64))
        for batch in batches:
            m = _list_matrix(batch.column(1), pl.shape[0])
            bits = (m @ pl) > 0                          # (batch, n_bits)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0),
                 pa.array((bits @ weights).astype(np.int64),
                          type=pa.int64())],
                ["id", "sig"])

    return (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .mapInArrow(_sig, f"id {id_type}, sig long"))


MIN_BAND_BITS = 8


def _validate_bands(n_bits: int, bands: int) -> int:
    """band width in bits; rejects scale-hostile geometries. Below 8
    bits a band has ≤256 distinct buckets, so the within-bucket
    self-join is Θ(n²/2^bits) — a cartesian in disguise at corpus
    scale (the r3 default of 16/4 = 4-bit bands was exactly this).
    Recall is tuned with more bands or multiprobe, never by shrinking
    the bucket space."""
    if bands <= 0 or bands > n_bits or n_bits % bands != 0:
        raise ValueError(f"n_bits ({n_bits}) must be a positive "
                         f"multiple of bands ({bands})")
    rows = n_bits // bands
    if rows < MIN_BAND_BITS:
        raise ValueError(
            f"band hash width {rows} bits < {MIN_BAND_BITS} "
            f"(n_bits={n_bits}, bands={bands}): ≤{1 << rows} buckets "
            "per band makes the bucket self-join quadratic at scale. "
            "Use wider bands and raise recall with multiprobe.")
    return rows


def _band_structs(sig_col, bands: int, rows: int, flips: bool):
    """Array of (band, bh) structs from a packed signature; with
    ``flips`` each band also emits its ``rows`` Hamming-1 variants
    (multi-probe: the query probes every bucket one hyperplane flip
    away — recall recovered by MORE PROBES, not coarser buckets)."""
    out = []
    for b in range(bands):
        base = (F.shiftrightunsigned(sig_col, rows * b)
                .bitwiseAND(F.lit((1 << rows) - 1)))
        out.append(F.struct(F.lit(b).alias("band"), base.alias("bh")))
        if flips:
            for j in range(rows):
                out.append(F.struct(
                    F.lit(b).alias("band"),
                    base.bitwiseXOR(F.lit(1 << j)).alias("bh")))
    return F.array(*out)


def lsh_candidate_pairs(df: DataFrame, vec_col: str, id_col: str,
                        n_bits: int, bands: int, dim: int, seed: int,
                        max_bucket: Optional[int], multiprobe: int,
                        directed: bool) -> DataFrame:
    """(id_a, id_b) LSH candidate pairs — the shared bucket join of
    lsh_topk (directed: every ordered pair) and cosine_near_dups lsh
    mode (undirected: id_a < id_b; sound because the Hamming-1 flip
    relation is symmetric). INDEX side capped at ``max_bucket`` rows
    per (band, bh), probe side at (1+band_bits)·max_bucket — both caps
    are count-windows partitioned on the join key itself, so under the
    at-scale sort-merge plan they reuse the join exchanges
    (plan-audited, tools/explain_plans.py check 16)."""
    from .dedup import _cap_buckets

    rows = _validate_bands(n_bits, bands)
    if multiprobe not in (0, 1):
        raise ValueError("multiprobe must be 0 or 1 (Hamming-1 probing)")
    sigs = hyperplane_signatures(df, vec_col, id_col, n_bits, dim, seed)
    index = _cap_buckets(
        sigs.select("id", F.explode(
            _band_structs(F.col("sig"), bands, rows, False)).alias("b"))
            .select("id", "b.band", "b.bh"),
        max_bucket)
    probe = sigs.select("id", F.explode(
        _band_structs(F.col("sig"), bands, rows, bool(multiprobe)))
        .alias("b")).select("id", "b.band", "b.bh")
    if max_bucket is not None:
        probe = _cap_buckets(probe, (1 + rows * multiprobe) * max_bucket)
    rel = (F.col("l.id") != F.col("r.id")) if directed \
        else (F.col("l.id") < F.col("r.id"))
    return (probe.alias("l").join(index.alias("r"), ["band", "bh"])
            .where(rel)
            .select(F.col("l.id").alias("id_a"),
                    F.col("r.id").alias("id_b"))
            .dropDuplicates())


def lsh_topk(corpus: DataFrame, vec_col: str = "embedding",
             id_col: str = "vec_id", k: int = 5, n_bits: int = 64,
             bands: int = 8, dim: int = 64, seed: int = 42,
             max_bucket: Optional[int] = 2000,
             multiprobe: int = 1) -> DataFrame:
    """All-pairs approximate top-k: LSH-bucketed candidates + exact
    cosine re-rank (Arrow-batch dot product) — the 100TB shape.

    Scale guarantees (VERDICT r3 #1): bands are ≥8 bits each
    (validated), the INDEX side of the bucket join is capped at
    ``max_bucket`` members per (band, bh) via the same
    ``dedup._cap_buckets`` window the dedup paths use (count the
    dropped rows with ``dedup.lsh_bucket_stats`` on the exploded
    relation), and the probe side is capped at
    (1+band_bits)·max_bucket. With both caps the per-bucket join work
    is bounded and total candidate volume is ≤
    n·bands·(1+band_bits)·max_bucket — linear in corpus size.
    ``multiprobe=1`` probes each band's Hamming-1 buckets as well
    (Lv et al., Multi-probe LSH, VLDB 2007): on the sf0.01
    embeddings this lifts recall@3 from 0.15 to 0.64 while examining
    27% of pairs, vs the old 4-bit bands' 0.97 recall from examining
    90% of ALL pairs (a cartesian by another name). ``multiprobe=0``
    restores single-probe.
    """
    cands = (lsh_candidate_pairs(corpus, vec_col, id_col, n_bits, bands,
                                 dim, seed, max_bucket, multiprobe,
                                 directed=True)
             .withColumnRenamed("id_a", "query_id")
             .withColumnRenamed("id_b", "neighbor_id"))
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    paired = (cands
              .join(vecs.withColumnRenamed("id", "query_id")
                        .withColumnRenamed("v", "qv"), "query_id")
              .join(vecs.withColumnRenamed("id", "neighbor_id")
                        .withColumnRenamed("v", "nv"), "neighbor_id"))

    qid_t = paired.schema["query_id"].dataType.simpleString()
    nid_t = paired.schema["neighbor_id"].dataType.simpleString()

    def _cos(batches):
        import pyarrow as pa
        for batch in batches:
            am = _list_matrix(batch.column(2), dim)
            bm = _list_matrix(batch.column(3), dim)
            an = np.linalg.norm(am, axis=1); an[an == 0] = 1
            bn = np.linalg.norm(bm, axis=1); bn[bn == 0] = 1
            out = np.einsum("ij,ij->i", am, bm) / (an * bn)
            # corrupt vectors → dropped here: Spark ranks NaN above
            # every double in the desc window (it would be rank-1 for
            # every query it buckets with)
            sel = pa.array(np.nonzero(np.isfinite(out))[0],
                           type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [batch.column(0).take(sel), batch.column(1).take(sel),
                 pa.array(out[np.isfinite(out)], type=pa.float64())],
                ["query_id", "neighbor_id", "cos_sim"])

    scored = (paired.select("query_id", "neighbor_id", "qv", "nv")
              .mapInArrow(_cos, f"query_id {qid_t}, neighbor_id {nid_t}, "
                                "cos_sim double"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantizer
# ---------------------------------------------------------------------------

def _spherical_kmeans(x: np.ndarray, k: int, iters: int = 15,
                      seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on unit vectors (k-means++ init,
    cosine assignment, renormalized means). Pure numpy, runs on the
    driver over a bounded training sample."""
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    idx = [int(rng.integers(len(x)))]
    for _ in range(k - 1):
        d = np.maximum(1.0 - np.max(x @ x[idx].T, axis=1), 0)
        total = d.sum()
        if total <= 0:
            idx.append(int(rng.integers(len(x))))
        else:
            idx.append(int(rng.choice(len(x), p=d / total)))
    cents = x[idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[j] = v / n
    return cents


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _nearest_cells(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmax-cosine cell id per unit row, tiled over rows so the sims
    buffer stays ~32 MB however many centroids there are — with the
    10³–10⁵ cells an at-scale index needs, an untiled (batch, k)
    matmul at batch 10⁴ × k 3·10⁴ would materialize 2.4 GB per task."""
    k = len(cents)
    out = np.empty(len(x), dtype=np.int32)
    step = max(1, (4 << 20) // max(k, 1))
    for i in range(0, len(x), step):
        out[i:i + step] = np.argmax(x[i:i + step] @ cents.T, axis=1)
    return out


# Driver-side training needs ≥ this many sample rows per requested cell;
# beyond it the sample statistically cannot place that many centroids
# (VERDICT r4 #3: 4,096 samples silently "training" 30k cells).
MIN_TRAIN_ROWS_PER_CELL = 32


def train_ivf_centroids(corpus: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id", n_cells: int = 16,
                        train_limit: int = 4096, kmeans_iters: int = 15,
                        seed: int = 42) -> np.ndarray:
    """Train the coarse quantizer on a deterministic pseudo-random
    sample: the ``train_limit`` smallest-xxhash64(id) rows. One
    TakeOrderedAndProject pass (per-partition top-k, driver merges k
    rows) — no full count() scan before training, and the sample is
    picked by key hash, never by position.

    Loud guard: refuses cell counts the sample cannot support — a
    10⁹-vector corpus needs ~√n ≈ 3·10⁴ cells, which no driver-side
    sample trains; use :func:`train_ivf_centroids_distributed`."""
    if n_cells > max(1, train_limit // MIN_TRAIN_ROWS_PER_CELL):
        raise ValueError(
            f"n_cells={n_cells} exceeds what a {train_limit}-row driver "
            f"sample can train (≥{MIN_TRAIN_ROWS_PER_CELL} rows/cell → "
            f"max {max(1, train_limit // MIN_TRAIN_ROWS_PER_CELL)}): use "
            "train_ivf_centroids_distributed, which trains executor-side "
            "over the full corpus and collects only k centroid rows")
    rows = (corpus
            .select(vec_col, F.xxhash64(F.col(id_col)).alias("__h"))
            .orderBy("__h").limit(train_limit)
            .select(vec_col).collect())
    mat = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    return _spherical_kmeans(_unit(mat), n_cells, kmeans_iters, seed)


def train_ivf_centroids_distributed(corpus: DataFrame,
                                    vec_col: str = "embedding",
                                    id_col: str = "vec_id",
                                    n_cells: int = 1024,
                                    iters: int = 4) -> np.ndarray:
    """Executor-side spherical k-means over the FULL corpus — nothing
    proportional to corpus size ever reaches the driver (VERDICT r4
    #1/#3: the driver trainer caps out at ~train_limit/32 cells, far
    below the ~√n cells a 10⁹–10¹⁰-vector corpus needs).

    Shape per iteration: broadcast the (k, dim) centroids; ONE
    mapInArrow pass computes per-partition partial sums — for each
    cell seen, (count, Σ unit vectors) — so a task emits ≤ k rows
    regardless of its row count (the map-side combine of the k-means
    M-step); a grouped applyInPandas reduces the ≤ P·k partials to k
    rows; only those k rows are collected. Driver memory and shuffle
    are O(P·k·dim), independent of corpus size — k can reach 10⁴–10⁵.

    Deterministic: init = the n_cells smallest-xxhash64(id) vectors
    (one TakeOrderedAndProject), and each reduce sums its partials in
    partition-id order, so reruns on the same input give bit-identical
    centroids. Empty cells keep their previous centroid (standard
    k-means practice; duplicates in the init sample resolve the same
    way)."""
    import pyarrow as pa
    spark = corpus.sparkSession
    rows = (corpus
            .select(vec_col, F.xxhash64(F.col(id_col)).alias("__h"))
            .orderBy("__h").limit(n_cells)
            .select(vec_col).collect())
    if not rows:
        raise ValueError("cannot train an IVF quantizer on an empty corpus")
    cents = _unit(np.vstack([np.asarray(r[0], dtype=np.float64)
                             for r in rows]))
    dim = cents.shape[1]
    src = corpus.select(F.col(vec_col).alias("v"))

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(np.ascontiguousarray(cents))

        def _partials(batches, _bc=bc):
            from pyspark import TaskContext
            c = _bc.value
            acc = np.zeros((len(c), dim), dtype=np.float64)
            cnt = np.zeros(len(c), dtype=np.int64)
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                m = _unit(_list_matrix(batch.column(0), dim))
                a = _nearest_cells(m, c)
                np.add.at(acc, a, m)
                cnt += np.bincount(a, minlength=len(c))
            nz = np.nonzero(cnt)[0]
            if not len(nz):
                return
            pid = TaskContext.get().partitionId()
            offs = pa.array(np.arange(len(nz) + 1, dtype=np.int32) * dim)
            yield pa.RecordBatch.from_arrays(
                [pa.array(nz.astype(np.int32)),
                 pa.array(np.full(len(nz), pid, dtype=np.int32)),
                 pa.array(cnt[nz]),
                 pa.ListArray.from_arrays(
                     offs, pa.array(acc[nz].ravel(), type=pa.float64()))],
                ["cell", "pid", "cnt", "s"])

        partials = src.mapInArrow(
            _partials, "cell int, pid int, cnt long, s array<double>")

        def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
            # ≤ P rows per cell; pid-sorted so the float sum order is
            # deterministic across reruns
            pdf = pdf.sort_values("pid")
            s = np.zeros(dim, dtype=np.float64)
            for v in pdf["s"]:
                s += np.asarray(v, dtype=np.float64)
            return pd.DataFrame({"cell": pdf["cell"].iloc[:1],
                                 "cnt": [int(pdf["cnt"].sum())],
                                 "s": [s]})

        got = (partials.groupBy("cell")
               .applyInPandas(_reduce, "cell int, cnt long, s array<double>")
               .collect())
        new = cents.copy()
        for r in got:
            v = np.asarray(r["s"], dtype=np.float64)
            nv = np.linalg.norm(v)
            if r["cnt"] > 0 and nv > 0:
                new[int(r["cell"])] = v / nv
        cents = new
    return cents


def ivf_assign(corpus: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Add an int `cell` column = nearest centroid by cosine. The cell
    column is a plain JVM-filterable int: writing the corpus partitioned
    by it turns probe-side `cell IN (...)` into partition pruning."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(centroids))
    vec_idx = corpus.columns.index(vec_col)
    names = corpus.columns + ["cell"]
    schema = StructType(corpus.schema.fields
                        + [StructField("cell", IntegerType(), False)])

    def _cell(batches):
        import pyarrow as pa
        cents = bc.value
        for batch in batches:
            m = _unit(_list_matrix(batch.column(vec_idx), cents.shape[1]))
            yield pa.RecordBatch.from_arrays(
                [*batch.columns,
                 pa.array(_nearest_cells(m, cents), type=pa.int32())],
                names)

    return corpus.mapInArrow(_cell, schema)


def _ivf_probe_plan(queries: DataFrame, centroids: np.ndarray,
                    vec_col: str, id_col: str, nprobe: int):
    """Driver-side probe plan: which cells each query visits, as a CSR
    cell→query-columns map -> (qids, unit qmat, (indptr, qcols),
    probed cells). CSR instead of the earlier (n_cells × nq) bool mask:
    the broadcast payload is O(nq·nprobe) int32 (~0.4 MB at 10⁴ queries
    × nprobe 8) where the dense mask was O(n_cells·nq) (~300 MB at
    3·10⁴ cells × 10⁴ queries — a per-task broadcast that would have
    capped the interactive path's batch size long before the driver
    collect did). Query sets beyond ~10⁴ belong on
    :func:`ivfpq_topk_joined`, which never materializes queries
    driver-side at all."""
    n_cells = len(centroids)
    nprobe = min(nprobe, n_cells)
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = _unit(np.vstack([np.asarray(r[1], dtype=np.float64)
                            for r in qrows]))
    # stable sort: an exact sim tie at the nprobe boundary (duplicate
    # centroids are reachable — duplicate init vectors persist through
    # k-means) must resolve to the LOWEST cell id in every serve path,
    # or the joined and broadcast paths would probe different cells
    order = np.argsort(-(qmat @ centroids.T), axis=1,
                       kind="stable")[:, :nprobe]
    cell_ids = order.ravel()
    q_ids = np.repeat(np.arange(len(qids), dtype=np.int32), nprobe)
    perm = np.lexsort((q_ids, cell_ids))
    indptr = np.zeros(n_cells + 1, dtype=np.int64)
    np.cumsum(np.bincount(cell_ids, minlength=n_cells), out=indptr[1:])
    qcols = q_ids[perm]
    probed_cells = np.unique(cell_ids).tolist()
    return qids, qmat, (indptr, qcols), probed_cells


def _probe_subset(cells: np.ndarray, indptr: np.ndarray,
                  qcols: np.ndarray):
    """-> (cols, keep, ucells, inv) for one Arrow batch: the global
    query columns that probed ANY of the batch's cells, a
    (len(cells), len(cols)) bool saying which row-query pairs are live,
    and the batch's distinct cells + row→distinct-cell index (so
    callers can compute per-unique-cell terms once and gather). The
    python loop is over the DISTINCT cells — 1 under a cell-partitioned
    scan, small always — never over rows or queries."""
    ucells, inv = np.unique(cells, return_inverse=True)
    parts = [qcols[indptr[c]:indptr[c + 1]] for c in ucells]
    flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    if not len(flat):
        return (np.empty(0, dtype=np.int64),
                np.zeros((len(cells), 0), dtype=bool), ucells, inv)
    cols = np.unique(flat)
    pos = np.zeros(int(cols[-1]) + 1, dtype=np.int64)
    pos[cols] = np.arange(len(cols))
    keep_u = np.zeros((len(ucells), len(cols)), dtype=bool)
    for i, p in enumerate(parts):
        keep_u[i, pos[p]] = True
    return cols, keep_u[inv], ucells, inv


def _ivf_score(assigned: DataFrame, qids: np.ndarray, qmat: np.ndarray,
               probes, vec_col: str, id_col: str,
               k: int, exclude_self: bool, dim: int) -> DataFrame:
    """Score an already cell-filtered corpus against the probe plan:
    partial top-k per Arrow batch (same reduction as brute_force_topk).
    The matmul is COLUMN-SUBSET: each batch scores only the queries
    that probed some cell present in the batch — under a
    cell-partitioned scan a batch is one cell, so the kernel does
    ~nprobe/n_cells of the brute-force flops instead of computing all
    nq similarity columns and masking afterwards (the r4 cold-path
    entry lost to brute force partly because of the full-width
    matmul). Non-probed (row, query) pairs inside the subset are still
    masked to -inf so a row is never returned to a query that did not
    probe its cell."""
    spark = assigned.sparkSession
    bc = spark.sparkContext.broadcast((qids, qmat, probes))
    out_schema = "query_id long, neighbor_id long, cos_sim double"
    m = k + (1 if exclude_self else 0)

    def _score(batches):
        qids_b, qn, (indptr, qcols) = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cells = _i64(batch.column(2))
            cols, subkeep, _, _ = _probe_subset(cells, indptr, qcols)
            if not len(cols):
                continue
            cmat = _unit(_list_matrix(batch.column(1), dim))
            sims = cmat @ qn[cols].T                      # (batch, ncols)
            # NaN/inf sims from corrupt vectors → -inf (same rationale
            # as brute_force_topk: NaN would rank first in the final
            # desc window and poison every probed query)
            sims = np.where(np.isfinite(sims), sims, -np.inf)
            masked = np.where(subkeep, sims, -np.inf)
            cids = _i64(batch.column(0))
            bi, qj = _partial_topk(masked, cids, m)
            ok = subkeep[bi, qj] & np.isfinite(sims[bi, qj])
            bi, qj = bi[ok], qj[ok]
            yield _topk_batch(qids_b, cols[qj], cids, bi, sims[bi, qj])

    scored = assigned.select(id_col, vec_col, "cell") \
                     .mapInArrow(_score, out_schema)
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def ivf_topk(corpus: DataFrame, queries: DataFrame,
             vec_col: str = "embedding", id_col: str = "vec_id",
             k: int = 5, n_cells: int = 16, nprobe: int = 8,
             train_limit: int = 4096, kmeans_iters: int = 15,
             seed: int = 42, exclude_self: bool = True,
             centroids: Optional[np.ndarray] = None) -> DataFrame:
    """IVF approximate cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    Each query scores only vectors in its ``nprobe`` nearest cells. The
    corpus-side prefilter is a JVM `cell IN (union of probed cells)`
    predicate — pushdown/partition-prunable — and the per-(row, query)
    cell mask is applied vectorized inside the scoring kernel, so a row
    is never scored against a query that did not probe its cell. For a
    corpus probed repeatedly, persist the assignment once with
    :func:`write_ivf_index` and query via :func:`ivf_topk_from_index` —
    the cell predicate then prunes whole parquet partitions on disk."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec_col, id_col, n_cells,
                                        train_limit, kmeans_iters, seed)
    qids, qmat, probes, probed_cells = _ivf_probe_plan(
        queries, centroids, vec_col, id_col, nprobe)
    assigned = ivf_assign(corpus, centroids, vec_col).where(
        F.col("cell").isin(probed_cells))
    return _ivf_score(assigned, qids, qmat, probes, vec_col, id_col,
                      k, exclude_self, centroids.shape[1])


IVF_CENTROIDS_FILE = "_ivf_centroids.npy"


def write_ivf_index(corpus: DataFrame, path: str,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    n_cells: int = 16, train_limit: int = 4096,
                    kmeans_iters: int = 15, seed: int = 42,
                    centroids: Optional[np.ndarray] = None) -> np.ndarray:
    """Persist the corpus as a CELL-PARTITIONED parquet IVF index: train
    (or take) the coarse quantizer, assign every vector, write
    ``partitionBy("cell")`` plus the centroids as an underscore-prefixed
    sidecar (ignored by Spark's reader). This pays the assignment once;
    every later probe reads ONLY its nprobe cells' directories — the
    `cell IN (...)` predicate becomes plan-time partition pruning, so a
    query touches ~nprobe/n_cells of the bytes on disk (the 100 TB serve
    shape). At-scale cell counts: train with
    :func:`train_ivf_centroids_distributed` and pass ``centroids=``.
    The centroids sidecar is written LAST and required by the
    reader, so an interrupted write is never mistaken for a complete
    index (same discipline as the filter-sidecar manifest)."""
    import os
    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec_col, id_col, n_cells,
                                        train_limit, kmeans_iters, seed)
    # partitionOverwriteMode pinned to static: under the session-level
    # 'dynamic' mode (common in production ETL) a rebuild would replace
    # only the cell dirs present in the NEW write, leaving stale cells
    # assigned under the OLD quantizer — the fresh centroids sidecar
    # then "completes" an index whose rows mix two quantizers.
    # repartition on cell BEFORE partitionBy: without it every writer
    # task holds rows of every cell, producing tasks×n_cells tiny files
    # (measured: 32×256 = 8k files made the pruned probe SLOWER than
    # brute force — file listing/open dominated). Hash-clustered, each
    # cell is written by exactly one task → ~one file per cell; a
    # deterministic hash exchange, never a sampling repartitionByRange
    # job. A pathologically hot cell serializes its own write — split
    # it by retraining with more centroids (see ivf_cell_stats).
    (ivf_assign(corpus, centroids, vec_col)
     .select(id_col, vec_col, "cell")
     .repartition(F.col("cell"))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "static")
     .partitionBy("cell").parquet(path))
    tmp = os.path.join(path, IVF_CENTROIDS_FILE + ".tmp")
    with open(tmp, "wb") as fh:
        np.save(fh, centroids)
    os.replace(tmp, os.path.join(path, IVF_CENTROIDS_FILE))
    return centroids


def read_ivf_index(spark, path: str):
    """-> (cell-partitioned corpus DataFrame, centroids). Raises on an
    index whose centroids sidecar is missing (interrupted write)."""
    import os
    f = os.path.join(path, IVF_CENTROIDS_FILE)
    if not os.path.exists(f):
        raise FileNotFoundError(
            f"{path} has no {IVF_CENTROIDS_FILE} — incomplete or not an "
            "IVF index (the sidecar is written last; rebuild with "
            "write_ivf_index)")
    return spark.read.parquet(path), np.load(f)


def ivf_topk_from_index(spark, path: str, queries: DataFrame,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        k: int = 5, nprobe: int = 8,
                        exclude_self: bool = True) -> DataFrame:
    """IVF top-k against a :func:`write_ivf_index` index: no assignment
    UDF at query time (cells are read from the partition column), and
    the cell predicate prunes whole partitions at plan time — the scan
    lists only the probed cells' directories (plan-audited:
    tools/explain_plans.py checks `PartitionFilters: [cell IN ...]`).
    Queries are collected driver-side (the interactive-batch shape,
    ≲10⁴ queries); for bulk query sets build a PQ index and use
    :func:`ivfpq_topk_joined`, which keeps queries distributed."""
    corpus, centroids = read_ivf_index(spark, path)
    qids, qmat, probes, probed_cells = _ivf_probe_plan(
        queries, centroids, vec_col, id_col, nprobe)
    assigned = corpus.where(F.col("cell").isin(probed_cells))
    return _ivf_score(assigned, qids, qmat, probes, vec_col, id_col,
                      k, exclude_self, centroids.shape[1])


def ivfpq_topk_joined(spark, path: str, queries: DataFrame,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      k: int = 5, nprobe: int = 8,
                      exclude_self: bool = True,
                      refine_with: Optional[DataFrame] = None,
                      refine_factor: int = 4) -> DataFrame:
    """Join-shaped IVF-PQ serve for query sets too large to broadcast:
    (query_id, neighbor_id, adc_sim, rank), same answer surface as
    :func:`ivfpq_topk_from_index`.

    The broadcast path collects EVERY query to the driver and ships an
    (n_cells × nq) probe mask to each task — at 10⁶ queries × 3·10⁴
    cells that is a multi-GB broadcast and a driver OOM (the same
    scale-killer class as driver-side quantizer training). Here the
    queries stay distributed end to end: one mapInArrow pass emits
    (cell, query_id, unit qvec as fixed-width bytes) probe rows —
    nq·nprobe rows, ~(8 + 8·dim) bytes each, the LSH-band-row idiom —
    then a cogroup on cell scores each cell's code block against
    exactly the queries that probed it (per-query LUTs recomputed
    in-task: m·n_codes·dsub flops, noise), with the per-cell partial
    top-k bounding the window exchange to ≤ nq·nprobe·k rows. Nothing
    anywhere is proportional to nq × n_cells or to nq on the driver.

    Use the broadcast path for interactive batches (≲10⁴ queries — it
    reads only probed-cell FILES, while this path's cogroup reads the
    index once); use this for offline bulk serving (model-eval sweeps,
    all-corpus kNN joins). Measured crossover at 2M×1024 cells:
    broadcast wins 100-query batches by ~17%, joined wins 10⁴-query
    batches 30× (BENCH/BASELINE.md r5). ``refine_with``/
    ``refine_factor`` as in :func:`ivfpq_topk_from_index`, except the
    re-rank joins are plain shuffle joins — nothing O(nq) is ever
    broadcast on this path."""
    code_df, centroids, codebooks = read_ivfpq_index(spark, path)
    m, n_codes, dsub = codebooks.shape
    dim = centroids.shape[1]
    n_cells = len(centroids)
    nprobe = min(nprobe, n_cells)
    kk = (k * refine_factor if refine_with is not None else k) \
        + (1 if exclude_self else 0)
    bc = spark.sparkContext.broadcast(
        (np.ascontiguousarray(centroids), np.ascontiguousarray(codebooks)))

    qsrc = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("v"))

    def _probe_rows(batches):
        import pyarrow as pa
        cents, _ = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            qm = _unit(_list_matrix(batch.column(1), dim))
            qids = _i64(batch.column(0))
            sims = qm @ cents.T
            # stable argsort, NOT argpartition: must pick the same
            # cells as _ivf_probe_plan on boundary ties or the two
            # serve paths would disagree
            top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            # chunk so each emitted batch's binary offsets stay well
            # under int32 (nq·nprobe·8·dim bytes overflows at ~10k
            # rows × dim 768 × nprobe 64 — silent numpy wraparound)
            max_rows = (2**30) // (8 * dim)
            step = max(1, max_rows // nprobe)
            for lo in range(0, len(qids), step):
                q_c = qids[lo:lo + step]
                t_c = top[lo:lo + step]
                n = len(q_c)
                rows = n * nprobe
                vec_bytes = qm[lo + np.repeat(np.arange(n), nprobe)]
                qv_arr = pa.Array.from_buffers(
                    pa.binary(), rows,
                    [None,
                     pa.py_buffer(np.arange(rows + 1, dtype=np.int32)
                                  * (8 * dim)),
                     pa.py_buffer(
                         np.ascontiguousarray(vec_bytes).tobytes())])
                yield pa.RecordBatch.from_arrays(
                    [pa.array(t_c.ravel().astype(np.int32)),
                     pa.array(np.repeat(q_c, nprobe), type=pa.int64()),
                     qv_arr],
                    ["cell", "query_id", "qv"])

    probes = qsrc.mapInArrow(
        _probe_rows, "cell int, query_id long, qv binary")

    def _score_cell(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                              "neighbor_id": pd.Series([], dtype="int64"),
                              "adc_sim": pd.Series([], dtype="float64")})
        if left.empty or right.empty:
            return empty
        cents, books = bc.value
        cell = int(left["cell"].iloc[0])
        codes = np.frombuffer(b"".join(left["code"]),
                              dtype=np.uint8).reshape(-1, m)
        qm = np.frombuffer(b"".join(right["qv"]),
                           dtype=np.float64).reshape(-1, dim)
        # jcq layout straight from einsum — the qjc + transpose copy
        # was the exact gather-layout tax the broadcast kernel avoids
        lutT = np.einsum("qjd,jcd->jcq", qm.reshape(-1, m, dsub), books)
        base = qm @ cents[cell]                       # (nq_c,)
        sims = np.broadcast_to(base, (len(codes), len(qm))).copy()
        for j in range(m):
            sims += lutT[j][codes[:, j]]
        sims = np.where(np.isfinite(sims), sims, -np.inf)
        cids = left["vec_id"].to_numpy()
        bi, qj = _partial_topk(sims, cids, kk)
        ok = np.isfinite(sims[bi, qj])
        bi, qj = bi[ok], qj[ok]
        return pd.DataFrame({
            "query_id": right["query_id"].to_numpy()[qj],
            "neighbor_id": cids[bi],
            "adc_sim": sims[bi, qj]})

    scored = (code_df.select("vec_id", "code", "cell").groupby("cell")
              .cogroup(probes.groupby("cell"))
              .applyInPandas(_score_cell,
                             "query_id long, neighbor_id long, "
                             "adc_sim double"))
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id").asc())
    topped = (scored.withColumn("rank", F.row_number().over(w))
              .where(F.col("rank") <= kk))
    if refine_with is None:
        return topped.where(F.col("rank") <= k)
    # bulk exact re-rank: plain shuffle joins — broadcasting O(nq)
    # query vectors here would reintroduce the exact payload this
    # path exists to avoid
    return _exact_rerank(topped, refine_with, queries, vec_col, id_col,
                         k, broadcast_queries=False)


def ivf_cell_stats(assigned: DataFrame) -> DataFrame:
    """Cell-skew telemetry for an ``ivf_assign``ed corpus (mirrors
    ``dedup.lsh_bucket_stats``): one row with n_cells_used, the largest
    cell's row count and its fraction of the corpus. A max_cell_frac
    near 1/n_cells is balanced; a cell holding >2-3× its fair share
    means the quantizer under-fits that region — retrain with more
    centroids (or split the hot cell: k-means on its members only and
    replace its centroid with the sub-centroids). Probe cost is
    proportional to the probed cells' row counts, so one hot cell
    slows EVERY query that probes it — this is the metric to alert on
    before it becomes the bottleneck."""
    per = assigned.groupBy("cell").agg(F.count("*").alias("m"))
    return per.agg(
        F.count("*").alias("n_cells_used"),
        F.max("m").alias("max_cell_rows"),
        (F.max("m") / F.sum("m")).alias("max_cell_frac"),
        F.sum("m").alias("n_rows"))


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized residual codes (the byte-compression serve path)
# ---------------------------------------------------------------------------
#
# IVF prunes WHICH bytes a probe reads (nprobe/n_cells of the corpus);
# PQ shrinks the bytes themselves: each vector is stored as m uint8
# codes (8-16 bytes) instead of dim float32 (256+ bytes for dim=64) —
# Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011 [PQ11]; IVFADC layout per [PQ11 §IV]. A probe
# against a 10⁹×768-dim corpus (≈3 TB raw) scans codes totalling
# ≈8-16 GB × nprobe/n_cells — the difference between an ANN serve that
# fits the page cache and one that re-reads the lake. Scoring is ADC
# (asymmetric distance computation): per query one (m, n_codes) lookup
# table of subspace dot products, then each candidate's similarity is
# m table gathers — no float decode of the corpus at all.

def _nearest_l2(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin-L2 row → centroid id, tiled like :func:`_nearest_cells`
    (argmin ‖x−c‖² ≡ argmin(‖c‖²/2 − x·c); ‖x‖² is constant per row)."""
    k = len(cents)
    half = 0.5 * np.einsum("kd,kd->k", cents, cents)
    out = np.empty(len(x), dtype=np.int32)
    step = max(1, (4 << 20) // max(k, 1))
    for i in range(0, len(x), step):
        out[i:i + step] = np.argmin(half[None, :] - x[i:i + step] @ cents.T,
                                    axis=1)
    return out


def _l2_kmeans(x: np.ndarray, k: int, iters: int = 12,
               seed: int = 42) -> np.ndarray:
    """Deterministic Euclidean k-means (k-means++ D² init) — PQ
    codebooks quantize residual SUBVECTORS, where plain L2 is the
    published objective ([PQ11 §II.A]; spherical k-means would force
    unit codewords onto residuals that are deliberately short)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    first = int(rng.integers(len(x)))
    idx = [first]
    d2 = np.einsum("nd,nd->n", x - x[first], x - x[first])
    for _ in range(k - 1):
        total = d2.sum()
        if total <= 0:
            idx.append(int(rng.integers(len(x))))
        else:
            idx.append(int(rng.choice(len(x), p=d2 / total)))
        diff = x - x[idx[-1]]
        d2 = np.minimum(d2, np.einsum("nd,nd->n", diff, diff))
    cents = x[idx].copy()
    for _ in range(iters):
        assign = _nearest_l2(x, cents)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, x)
        cnt = np.bincount(assign, minlength=len(cents))
        nz = cnt > 0
        cents[nz] = sums[nz] / cnt[nz, None]   # empty cells keep previous
    return cents


def train_pq_codebooks(corpus: DataFrame, centroids: np.ndarray,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       m: int = 8, n_codes: int = 256,
                       train_limit: int = 32768, iters: int = 12,
                       seed: int = 42) -> np.ndarray:
    """Train (m, n_codes, dim/m) PQ codebooks over coarse-cell RESIDUALS
    (unit vector − its cell centroid, [PQ11 §IV.A]'s IVFADC) on a
    deterministic driver-side sample (smallest-xxhash64(id) rows, the
    same idiom as :func:`train_ivf_centroids`).

    Sample training is the CORRECT at-scale design here, unlike the
    coarse quantizer: codebook capacity is FIXED at m·n_codes·dsub
    floats regardless of corpus size (n_codes ≤ 256 so codes fit
    uint8), so a 32k-row sample trains a 10⁹-vector corpus's codebooks
    exactly as well as a full pass would — there is no k-grows-with-√n
    effect to outgrow the sample (VERDICT r4 #3 applied only to
    n_cells)."""
    dim = centroids.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    if not 1 <= n_codes <= 256:
        raise ValueError("n_codes must be in [1, 256] (codes are uint8)")
    dsub = dim // m
    rows = (corpus
            .select(vec_col, F.xxhash64(F.col(id_col)).alias("__h"))
            .orderBy("__h").limit(train_limit)
            .select(vec_col).collect())
    if not rows:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    mat = _unit(np.vstack([np.asarray(r[0], dtype=np.float64)
                           for r in rows]))
    res = mat - centroids[_nearest_cells(mat, centroids)]
    books = np.zeros((m, n_codes, dsub), dtype=np.float64)
    for j in range(m):
        got = _l2_kmeans(res[:, j * dsub:(j + 1) * dsub], n_codes,
                         iters, seed + j)
        books[j, :len(got)] = got
        if len(got) < n_codes:
            # sample smaller than the codebook: repeat the last codeword
            # so the array stays regular; encode never picks a duplicate
            # over its identical twin's first index, so codes (and the
            # index bytes) stay deterministic
            books[j, len(got):] = got[-1]
    return books


def _pq_encode(mat_unit: np.ndarray, cells: np.ndarray,
               centroids: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per subspace, nearest codeword to the
    coarse residual."""
    m, _, dsub = codebooks.shape
    res = mat_unit - centroids[cells]
    codes = np.empty((len(mat_unit), m), dtype=np.uint8)
    for j in range(m):
        codes[:, j] = _nearest_l2(res[:, j * dsub:(j + 1) * dsub],
                                  codebooks[j]).astype(np.uint8)
    return codes


def _binary_matrix(col, m: int) -> np.ndarray:
    """(n, m) uint8 matrix from an Arrow Binary column of fixed-length
    values — straight from the offsets/data buffers, zero per-row
    Python (the `_list_matrix` idiom for bytes)."""
    import pyarrow as pa
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_binary(col.type):
        col = col.cast(pa.binary())
    if col.null_count:
        raise ValueError("PQ code column contains NULLs — corrupt index")
    n = len(col)
    if n == 0:
        return np.empty((0, m), dtype=np.uint8)
    # BinaryArray buffers: [validity, int32 offsets, data]; honor the
    # slice offset a sliced batch carries
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset:col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    if (lens != m).any():
        i = int(np.nonzero(lens != m)[0][0])
        raise ValueError(f"PQ code length {int(lens[i])} != m {m} "
                         f"at batch row {i}")
    return data[offs[0]:offs[-1]].reshape(n, m)


IVFPQ_CODEBOOKS_FILE = "_pq_codebooks.npy"


def _write_ivfpq_sidecars(path: str, centroids: np.ndarray,
                          codebooks: np.ndarray) -> None:
    """Atomically publish the two quantizer sidecars (tmp + rename,
    centroids first, codebooks LAST = the completion marker the reader
    requires). The ONE place the write/read sidecar contract lives —
    write_ivfpq_index, compact_ivfpq_index and the streaming ingest
    sink all go through here."""
    import os
    for fname, arr in ((IVF_CENTROIDS_FILE, centroids),
                       (IVFPQ_CODEBOOKS_FILE, codebooks)):
        tmp = os.path.join(path, fname + ".tmp")
        with open(tmp, "wb") as fh:
            np.save(fh, np.asarray(arr))
        os.replace(tmp, os.path.join(path, fname))


def ivfpq_encode(corpus: DataFrame, centroids: np.ndarray,
                 codebooks: np.ndarray, vec_col: str = "embedding",
                 id_col: str = "vec_id",
                 with_coarse_dist: bool = False) -> DataFrame:
    """-> (vec_id, code binary, cell int): one mapInArrow pass assigns
    the coarse cell and PQ-encodes the residual. The shared kernel
    under :func:`write_ivfpq_index` and the streaming ingest sink.

    ``with_coarse_dist`` appends a float64 ``coarse_dist`` column
    (1 − cos to the assigned centroid — the quantizer-fit residual):
    its distribution over arriving data is the drift signal a frozen
    quantizer needs (rising coarse_dist = the corpus has moved away
    from the cells; retrain + compact)."""
    spark = corpus.sparkSession
    m = codebooks.shape[0]
    dim = centroids.shape[1]
    bc = spark.sparkContext.broadcast(
        (np.ascontiguousarray(centroids), np.ascontiguousarray(codebooks)))
    src = corpus.select(F.col(id_col).alias("vec_id"),
                        F.col(vec_col).alias("v"))
    schema = "vec_id long, code binary, cell int"
    if with_coarse_dist:
        schema += ", coarse_dist double"

    def _encode(batches):
        import pyarrow as pa
        cents, books = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            mat = _unit(_list_matrix(batch.column(1), dim))
            cells = _nearest_cells(mat, cents)
            codes = _pq_encode(mat, cells, cents, books)
            n = len(codes)
            # binary column straight from buffers (rows are contiguous
            # m-byte slices of the codes matrix) — no per-row Python
            code_arr = pa.Array.from_buffers(
                pa.binary(), n,
                [None,
                 pa.py_buffer(np.arange(n + 1, dtype=np.int32) * m),
                 pa.py_buffer(np.ascontiguousarray(codes).tobytes())])
            cols = [batch.column(0), code_arr,
                    pa.array(cells, type=pa.int32())]
            names = ["vec_id", "code", "cell"]
            if with_coarse_dist:
                cols.append(pa.array(
                    1.0 - np.einsum("nd,nd->n", mat, cents[cells]),
                    type=pa.float64()))
                names.append("coarse_dist")
            yield pa.RecordBatch.from_arrays(cols, names)

    return src.mapInArrow(_encode, schema)


def write_ivfpq_index(corpus: DataFrame, path: str,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      n_cells: int = 16, m: int = 8, n_codes: int = 256,
                      train_limit: int = 32768, seed: int = 42,
                      centroids: Optional[np.ndarray] = None,
                      codebooks: Optional[np.ndarray] = None):
    """Persist the corpus as a cell-partitioned IVF-PQ index: rows are
    (id, m-byte PQ code) only — the full-precision embedding is NOT
    stored, so the on-disk serve set is ~m/(4·dim) of the raw corpus
    (32× at dim=64, m=8) ON TOP of the nprobe/n_cells partition
    pruning. One mapInArrow pass assigns the cell and encodes the
    residual together; same hash-clustered one-file-per-cell write and
    written-last sidecar completion discipline as
    :func:`write_ivf_index` (codebooks land after centroids, and the
    reader requires both, so an interrupted write never serves).
    At-scale cell counts: train with
    :func:`train_ivf_centroids_distributed` and pass ``centroids=``
    (PQ codebooks have no such need — see :func:`train_pq_codebooks`).
    Returns (centroids, codebooks)."""
    import os
    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec_col, id_col, n_cells,
                                        seed=seed)
    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, centroids, vec_col, id_col,
                                       m, n_codes, train_limit, seed=seed)
    (ivfpq_encode(corpus, centroids, codebooks, vec_col, id_col)
     .repartition(F.col("cell"))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "static")
     .partitionBy("cell").parquet(path))
    _write_ivfpq_sidecars(path, centroids, codebooks)
    return centroids, codebooks


def read_ivfpq_index(spark, path: str):
    """-> (code DataFrame, centroids, codebooks); raises on a missing
    sidecar (interrupted write)."""
    import os
    out = []
    for fname in (IVF_CENTROIDS_FILE, IVFPQ_CODEBOOKS_FILE):
        f = os.path.join(path, fname)
        if not os.path.exists(f):
            raise FileNotFoundError(
                f"{path} has no {fname} — incomplete or not an IVF-PQ "
                "index (sidecars are written last; rebuild with "
                "write_ivfpq_index)")
        out.append(np.load(f))
    return spark.read.parquet(path), out[0], out[1]


def compact_ivfpq_index(spark, src_path: str, out_path: str,
                        delete_ids: Optional[DataFrame] = None,
                        id_col: str = "vec_id") -> None:
    """Seal a streaming-ingest index (``streaming.ivfpq_ingest_sink``'s
    batch=N/cell=K accretion) into the canonical one-file-per-cell
    layout ``write_ivfpq_index`` produces: ONE deterministic hash
    exchange on cell, sidecars copied last (the completion marker), the
    batch partition column dropped. A long-running ingest accretes
    ≤ n_cells files per trigger; probes pay file listing/open per
    probed cell × batch, so compaction restores the O(probed cells)
    file count. Also accepts an already-canonical index (idempotent
    re-layout).

    ``delete_ids`` (a DataFrame carrying ``id_col``): drop those
    vectors while rewriting — the index's deletion path. Codes are
    static (like xor/fuse filters, an encoded row cannot be retracted
    in place), so deletes ride the compaction rewrite as a broadcast
    anti-join; between compactions, filter deleted ids from the serve
    RESULT instead (an anti-join on the top-k output is k·nq rows)."""
    import os
    # realpath, not abspath: a symlinked out_path aliasing src_path
    # would pass an abspath compare and the overwrite would delete its
    # own input mid-scan
    if os.path.realpath(out_path) == os.path.realpath(src_path):
        raise ValueError(
            "compact_ivfpq_index cannot compact in place: the overwrite "
            "would delete its own input mid-scan. Write to a new path "
            "and swap directories afterwards.")
    df, centroids, codebooks = read_ivfpq_index(spark, src_path)
    if delete_ids is not None:
        df = df.join(
            F.broadcast(delete_ids.select(F.col(id_col).alias("vec_id"))
                        .dropDuplicates()),
            "vec_id", "left_anti")
    (df.select("vec_id", "code", "cell")
     .repartition(F.col("cell"))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "static")
     .partitionBy("cell").parquet(out_path))
    _write_ivfpq_sidecars(out_path, centroids, codebooks)


def ivfpq_topk_from_index(spark, path: str, queries: DataFrame,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id", k: int = 5,
                          nprobe: int = 8, exclude_self: bool = True,
                          refine_with: Optional[DataFrame] = None,
                          refine_factor: int = 4) -> DataFrame:
    """ADC top-k against a :func:`write_ivfpq_index` index:
    (query_id, neighbor_id, adc_sim, rank) — adc_sim ≈ cosine, computed
    as q·centroid[cell] + Σ_j LUT_q[j, code_j] with the per-query
    (m, n_codes) lookup tables broadcast from the driver. The scan
    reads ONLY (vec_id, code) under a `cell IN (...)` partition filter:
    bytes touched ≈ corpus · nprobe/n_cells · m/(4·dim).

    ``refine_with`` (a DataFrame carrying ``id_col``/``vec_col`` full
    vectors — typically the original corpus relation): re-rank the top
    ``k·refine_factor`` ADC candidates by EXACT cosine, entirely in
    Catalyst (the [PQ11 §V] re-ranking stage; the expensive relation is
    only joined on the tiny candidate set). Then the output column is
    the exact ``cos_sim``."""
    code_df, centroids, codebooks = read_ivfpq_index(spark, path)
    m, n_codes, dsub = codebooks.shape
    qids, qmat, probes, probed_cells = _ivf_probe_plan(
        queries, centroids, vec_col, id_col, nprobe)
    # broadcast payload is O(nq·dim + n_cells·dim + m·n_codes·dsub):
    # per-query LUTs and centroid dots are recomputed in-kernel for the
    # batch's probing columns only (the joined path's idiom) — the
    # earlier driver-side (nq, n_cells) base + (nq, m, n_codes) LUT
    # arrays were a quadratic-class broadcast (160+ MB at 10⁴ queries)
    bc = spark.sparkContext.broadcast(
        (qids, np.ascontiguousarray(qmat), probes,
         np.ascontiguousarray(centroids), np.ascontiguousarray(codebooks)))
    kk = (k * refine_factor if refine_with is not None else k) \
        + (1 if exclude_self else 0)

    def _adc(batches):
        import pyarrow as pa
        qids_b, qn, (indptr, qcols), cents, books = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cells = _i64(batch.column(2))
            cols, subkeep, ucells, inv = _probe_subset(cells, indptr,
                                                       qcols)
            if not len(cols):
                continue
            codes = _binary_matrix(batch.column(1), m)
            # gathers laid out so the OUTPUT (batch, ncols) is the
            # contiguous axis: row-gather from (n_codes, ncols) tables.
            # The obvious lut[cols, j][:, codes].T form column-gathers
            # then transposes — measured ~2.5× slower end-to-end at
            # the 200k bench tier. einsum emits lutT directly in
            # (m, n_codes, ncols) layout, no transpose copy.
            qsub = qn[cols]
            lutT = np.einsum("qjd,jcd->jcq",
                             qsub.reshape(len(qsub), m, dsub), books)
            base_u = cents[ucells] @ qsub.T                # (ucells, ncols)
            sims = base_u[inv]                             # (batch, ncols)
            for j in range(m):
                sims += lutT[j][codes[:, j]]
            sims = np.where(np.isfinite(sims), sims, -np.inf)
            masked = np.where(subkeep, sims, -np.inf)
            cids = _i64(batch.column(0))
            bi, qj = _partial_topk(masked, cids, kk)
            ok = subkeep[bi, qj] & np.isfinite(sims[bi, qj])
            bi, qj = bi[ok], qj[ok]
            yield pa.RecordBatch.from_arrays(
                [pa.array(qids_b[cols[qj]], type=pa.int64()),
                 pa.array(cids[bi], type=pa.int64()),
                 pa.array(sims[bi, qj], type=pa.float64())],
                ["query_id", "neighbor_id", "adc_sim"])

    scored = (code_df.where(F.col("cell").isin(probed_cells))
              .select("vec_id", "code", "cell")
              .mapInArrow(_adc, "query_id long, neighbor_id long, "
                                "adc_sim double"))
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id").asc())
    topped = (scored.withColumn("rank", F.row_number().over(w))
              .where(F.col("rank") <= kk))
    if refine_with is None:
        return topped.where(F.col("rank") <= k)
    return _exact_rerank(topped, refine_with, queries, vec_col, id_col,
                         k, broadcast_queries=True)


def _exact_rerank(topped: DataFrame, refine_with: DataFrame,
                  queries: DataFrame, vec_col: str, id_col: str,
                  k: int, broadcast_queries: bool) -> DataFrame:
    """[PQ11 §V] exact re-rank of the ADC candidate set: join full
    vectors onto the ≤ nq·k·refine_factor candidates (never the
    reverse — the big relation stays the probe side of a semi-sized
    join), cosine in Catalyst (the cosine_near_dups fold).
    ``broadcast_queries`` for interactive batches only — a bulk
    (joined-path) caller must NOT broadcast O(nq) vectors."""
    cand = topped.select("query_id", "neighbor_id")
    full = refine_with.select(F.col(id_col).alias("neighbor_id"),
                              F.col(vec_col).alias("__nv"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("__qv"))
    if broadcast_queries:
        qv = F.broadcast(qv)
    dot = _jvm_dot(F.col("__qv"), F.col("__nv"))
    nrm = (F.sqrt(_jvm_dot(F.col("__qv"), F.col("__qv")))
           * F.sqrt(_jvm_dot(F.col("__nv"), F.col("__nv"))))
    exact = (cand.join(full, "neighbor_id")
             .join(qv, "query_id")
             .withColumn("cos_sim", dot / nrm)
             # a corrupt full-precision vector (NaN component) yields a
             # NaN cosine, and Spark ranks NaN ABOVE every double in a
             # desc window — without this filter one bad row wins rank
             # 1 for every query it reaches (same guard as
             # cosine_near_dups / the ADC kernels' -inf sanitize)
             .where(~F.isnan(F.col("cos_sim")))
             .select("query_id", "neighbor_id", "cos_sim"))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (exact.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------

def _jvm_dot(u, v):
    """Dot product entirely in Catalyst (double precision):
    zip_with product fold — no Python worker in the loop."""
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def cosine_near_dups(df: DataFrame, vec_col: str = "embedding",
                     id_col: str = "vec_id", threshold: float = 0.35,
                     method: str = "exact", n_bits: int = 64,
                     bands: int = 8, dim: int = 64,
                     seed: int = 42, max_bucket: Optional[int] = 2000,
                     multiprobe: int = 1) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, cos_sim >= threshold).

    method='exact': broadcast self-join, cosine in Catalyst — exact
    answer, O(n^2) scoring; the verify stage / small-side baseline.
    method='lsh': hyperplane-band candidates first, exact cosine only
    on candidates — the at-scale pre-filter (may miss pairs whose
    signatures collide in no band; recall tunable via bands/multiprobe
    — the Hamming-1 flip relation is symmetric, so the id_a < id_b
    dedup loses no pairs). Same scale guards as lsh_topk: ≥8-bit
    bands enforced, buckets capped at ``max_bucket``."""
    # norms once per vector BEFORE the pair join: the join then folds
    # one dot per pair instead of three
    normed = df.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("v")) \
               .withColumn("nrm", F.sqrt(_jvm_dot(F.col("v"), F.col("v"))))
    left = normed.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                         F.col("nrm").alias("na"))
    right = normed.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                          F.col("nrm").alias("nb"))
    if method == "exact":
        pairs = left.join(F.broadcast(right),
                          F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        cands = lsh_candidate_pairs(df, vec_col, id_col, n_bits, bands,
                                    dim, seed, max_bucket, multiprobe,
                                    directed=False)
        pairs = (cands
                 .join(left.withColumnRenamed("id_a", "id_a2"),
                       F.col("id_a") == F.col("id_a2")).drop("id_a2")
                 .join(right.withColumnRenamed("id_b", "id_b2"),
                       F.col("id_b") == F.col("id_b2")).drop("id_b2"))
    else:
        raise ValueError(f"unknown method {method!r}")
    # ~isnan: Spark treats NaN as LARGER than any double, so a corrupt
    # vector (NaN component → NaN cosine against everything) would pass
    # `>= threshold` and flag every partner as its near-duplicate
    return (pairs
            .withColumn("cos_sim", _jvm_dot(F.col("va"), F.col("vb"))
                        / (F.col("na") * F.col("nb")))
            .where((F.col("cos_sim") >= threshold)
                   & ~F.isnan(F.col("cos_sim")))
            .select("id_a", "id_b", "cos_sim"))
