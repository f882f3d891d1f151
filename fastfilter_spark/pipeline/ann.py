"""Approximate nearest neighbour search over embedding columns.

Two paths:

* brute_force_topk — exact cosine top-k. The dot products run in an
  Arrow-vectorized pandas UDF as one numpy matmul per batch against a
  broadcast query matrix (this beats per-row F.aggregate/zip_with by
  an order of magnitude and stays off the driver). Scales linearly in
  corpus size: fine as the baseline / verify stage.
* lsh_topk — random-hyperplane LSH: m-bit signatures via the same
  batched matmul, candidates blocked on signature bands, exact cosine
  re-rank of candidates only. The scale path: shuffle moves only
  (band, sig) buckets, never the cross product.
* ivf_topk — IVF (inverted-file) coarse quantizer: spherical k-means
  centroids trained on a bounded deterministic sample, every corpus
  vector assigned to its nearest cell JVM-filterable `cell` column,
  queries probe only their `nprobe` nearest cells. The alternative
  scale path: with the corpus written partitioned-by-cell, the
  `cell IN (...)` predicate becomes partition pruning and a probe
  touches nprobe/n_cells of the data.
* cosine_near_dups — embedding-cosine near-duplicate pairs. Exact
  mode keeps the whole cosine in Catalyst (zip_with/aggregate fold,
  no Python in the hot path) over a broadcast self-join — the verify
  stage; LSH mode pre-filters candidates by signature bands first —
  the 100 TB stage.

Vectors are `array<float>` columns; norms are precomputed JVM-side.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_matrix(series: pd.Series, dim: int) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) if v is not None
                      else np.zeros(dim) for v in series])


def brute_force_topk(corpus: DataFrame, queries: DataFrame,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     k: int = 5, exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    queries is collected to a broadcast matrix (queries are the small
    side by design — for all-pairs use lsh_topk).
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

    def _score(batches):
        qids_b, qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = _as_matrix(pdf[vec_col], dim)
            cnorm = np.linalg.norm(cmat, axis=1)
            cnorm[cnorm == 0] = 1.0
            sims = (cmat / cnorm[:, None]) @ qn.T      # (batch, nq)
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            nq = len(qids_b)
            yield pd.DataFrame({
                "query_id": np.repeat(qids_b, len(cids)),
                "neighbor_id": np.tile(cids, nq),
                "cos_sim": sims.T.ravel(),
            })

    scored = corpus.select(id_col, vec_col).mapInPandas(_score, out_schema)
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

    @F.pandas_udf("long")
    def _sig(vec: pd.Series) -> pd.Series:
        pl = bc.value
        m = _as_matrix(vec, pl.shape[0])
        bits = (m @ pl) > 0                              # (batch, n_bits)
        weights = (1 << np.arange(pl.shape[1], dtype=np.int64))
        return pd.Series((bits @ weights).astype(np.int64))

    return df.select(F.col(id_col).alias("id"), _sig(F.col(vec_col)).alias("sig"))


def lsh_topk(corpus: DataFrame, vec_col: str = "embedding",
             id_col: str = "vec_id", k: int = 5, n_bits: int = 16,
             bands: int = 4, dim: int = 64, seed: int = 42) -> DataFrame:
    """All-pairs approximate top-k: LSH-bucketed candidates + exact
    cosine re-rank (pandas-UDF dot product) — the 100TB shape."""
    if bands > n_bits or n_bits % bands != 0:
        # bands > n_bits would give 0 bits per band: every row lands in
        # bucket 0 and the self-join becomes the full O(n²) cross
        # product — the exact blowup LSH exists to avoid
        raise ValueError(f"n_bits ({n_bits}) must be a positive "
                         f"multiple of bands ({bands})")
    rows = n_bits // bands
    sigs = hyperplane_signatures(corpus, vec_col, id_col, n_bits, dim, seed)
    band_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftrightunsigned(F.col("sig"), rows * b)
                 .bitwiseAND(F.lit((1 << rows) - 1)).alias("bh"))
        for b in range(bands)
    ])
    e = sigs.select("id", F.explode(band_arr).alias("b")) \
            .select("id", "b.band", "b.bh")
    l, r = e.alias("l"), e.alias("r")
    cands = (l.join(r, ["band", "bh"])
             .where(F.col("l.id") != F.col("r.id"))
             .select(F.col("l.id").alias("query_id"),
                     F.col("r.id").alias("neighbor_id"))
             .dropDuplicates())
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    paired = (cands
              .join(vecs.withColumnRenamed("id", "query_id")
                        .withColumnRenamed("v", "qv"), "query_id")
              .join(vecs.withColumnRenamed("id", "neighbor_id")
                        .withColumnRenamed("v", "nv"), "neighbor_id"))

    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        am = _as_matrix(a, dim)
        bm = _as_matrix(b, dim)
        an = np.linalg.norm(am, axis=1); an[an == 0] = 1
        bn = np.linalg.norm(bm, axis=1); bn[bn == 0] = 1
        return pd.Series(np.einsum("ij,ij->i", am, bm) / (an * bn))

    scored = paired.withColumn("cos_sim", _cos("qv", "nv")) \
                   .select("query_id", "neighbor_id", "cos_sim")
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


def train_ivf_centroids(corpus: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id", n_cells: int = 16,
                        train_limit: int = 4096, kmeans_iters: int = 15,
                        seed: int = 42) -> np.ndarray:
    """Train the coarse quantizer on a deterministic pseudo-random
    sample: the ``train_limit`` smallest-xxhash64(id) rows. One
    TakeOrderedAndProject pass (per-partition top-k, driver merges k
    rows) — no full count() scan before training, and the sample is
    picked by key hash, never by position."""
    rows = (corpus
            .select(vec_col, F.xxhash64(F.col(id_col)).alias("__h"))
            .orderBy("__h").limit(train_limit)
            .select(vec_col).collect())
    mat = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    return _spherical_kmeans(_unit(mat), n_cells, kmeans_iters, seed)


def ivf_assign(corpus: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Add an int `cell` column = nearest centroid by cosine. The cell
    column is a plain JVM-filterable int: writing the corpus partitioned
    by it turns probe-side `cell IN (...)` into partition pruning."""
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf("int")
    def _cell(vec: pd.Series) -> pd.Series:
        cents = bc.value
        m = _unit(_as_matrix(vec, cents.shape[1]))
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype(np.int32))

    return corpus.withColumn("cell", _cell(F.col(vec_col)))


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
    cell mask is applied vectorized inside the scoring UDF, so a row is
    never scored against a query that did not probe its cell."""
    spark = corpus.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec_col, id_col, n_cells,
                                        train_limit, kmeans_iters, seed)
    n_cells = len(centroids)
    nprobe = min(nprobe, n_cells)

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = _unit(np.vstack([np.asarray(r[1], dtype=np.float64)
                            for r in qrows]))
    # (nq, nprobe) probed cells per query + (n_cells, nq) membership mask
    order = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    probe_mask = np.zeros((n_cells, len(qids)), dtype=bool)
    for qi in range(len(qids)):
        probe_mask[order[qi], qi] = True
    probed_cells = sorted({int(c) for c in order.ravel()})
    bc = spark.sparkContext.broadcast((qids, qmat, probe_mask))

    assigned = ivf_assign(corpus, centroids, vec_col).where(
        F.col("cell").isin(probed_cells))

    out_schema = "query_id long, neighbor_id long, cos_sim double"
    dim = centroids.shape[1]

    def _score(batches):
        qids_b, qn, mask = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = _unit(_as_matrix(pdf[vec_col], dim))
            sims = cmat @ qn.T                            # (batch, nq)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            keep = mask[cells]                            # (batch, nq)
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            bi, qi = np.nonzero(keep)
            yield pd.DataFrame({
                "query_id": qids_b[qi],
                "neighbor_id": cids[bi],
                "cos_sim": sims[bi, qi],
            })

    scored = assigned.select(id_col, vec_col, "cell") \
                     .mapInPandas(_score, out_schema)
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
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
                     method: str = "exact", n_bits: int = 16,
                     bands: int = 8, dim: int = 64,
                     seed: int = 42) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, cos_sim >= threshold).

    method='exact': broadcast self-join, cosine in Catalyst — exact
    answer, O(n^2) scoring; the verify stage / small-side baseline.
    method='lsh': hyperplane-band candidates first, exact cosine only
    on candidates — the at-scale pre-filter (may miss pairs whose
    signatures collide in no band; recall tunable via n_bits/bands)."""
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
        sigs = hyperplane_signatures(df, vec_col, id_col, n_bits, dim, seed)
        rows = n_bits // bands
        band_arr = F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftrightunsigned(F.col("sig"), rows * b)
                     .bitwiseAND(F.lit((1 << rows) - 1)).alias("bh"))
            for b in range(bands)
        ])
        e = sigs.select("id", F.explode(band_arr).alias("b")) \
                .select("id", "b.band", "b.bh")
        cands = (e.alias("l").join(e.alias("r"), ["band", "bh"])
                 .where(F.col("l.id") < F.col("r.id"))
                 .select(F.col("l.id").alias("id_a"),
                         F.col("r.id").alias("id_b"))
                 .dropDuplicates())
        pairs = (cands
                 .join(left.withColumnRenamed("id_a", "id_a2")
                       .withColumnRenamed("va", "va"),
                       F.col("id_a") == F.col("id_a2")).drop("id_a2")
                 .join(right.withColumnRenamed("id_b", "id_b2")
                       .withColumnRenamed("vb", "vb"),
                       F.col("id_b") == F.col("id_b2")).drop("id_b2"))
    else:
        raise ValueError(f"unknown method {method!r}")
    return (pairs
            .withColumn("cos_sim", _jvm_dot(F.col("va"), F.col("vb"))
                        / (F.col("na") * F.col("nb")))
            .where(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim"))
