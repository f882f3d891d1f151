"""Training-data pipeline operators: dedup tiers, text analysis, ANN,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.pipeline import (
    brute_force_topk, exact_dedup, distinct_by_content, extract_features,
    frame_sample, lang_id, lsh_topk, make_fake_media, minhash_dedup,
    ngram_jaccard_pairs, simhash, simhash_candidates, with_text_analysis,
)
from fixtures.gen import gen_corpus


@pytest.fixture(scope="module")
def dup_corpus(spark):
    pdf = gen_corpus(1500, seed=3, dupe_frac=0.15)
    pdf.insert(0, "doc_id", range(len(pdf)))
    df = spark.createDataFrame(pdf)
    df.cache().count()
    return df, pdf


def test_exact_dedup_counts(spark, dup_corpus):
    df, pdf = dup_corpus
    groups = exact_dedup(df, "content", "doc_id")
    assert groups.count() == pdf["content"].nunique()
    total = groups.agg(F.sum("n_copies")).collect()[0][0]
    assert total == len(pdf)
    kept = distinct_by_content(df, "content", "doc_id")
    assert kept.count() == pdf["content"].nunique()


def test_minhash_finds_exact_dupes(spark, dup_corpus):
    df, pdf = dup_corpus
    pairs = minhash_dedup(df, "content", "doc_id", threshold=0.9,
                          dedup_first=False).toPandas()
    # every exact-duplicate pair has Jaccard 1.0 and identical signatures
    # → must be found (LSH recall = 1 for identical docs)
    dup_groups = pdf.groupby("content")["doc_id"].apply(list)
    expected = set()
    for ids in dup_groups:
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expected.add((ids[i], ids[j]))
    found = set(zip(pairs.id_a, pairs.id_b))
    assert expected <= found
    assert (pairs.jaccard >= 0.9).all()  # verify stage is exact


def test_simhash_exact_dupes_distance_zero(spark, dup_corpus):
    df, pdf = dup_corpus
    sh = simhash(df, "content", "doc_id").toPandas().set_index("id")["simhash"]
    dup_groups = [sorted(g) for g in
                  pdf.groupby("content")["doc_id"].apply(list) if len(g) > 1]
    assert dup_groups
    for g in dup_groups:
        assert len({sh[i] for i in g}) == 1  # identical docs → same simhash
    cands = simhash_candidates(df, "content", "doc_id", max_hamming=0)
    found = {(r.id_a, r.id_b) for r in cands.collect()}
    for g in dup_groups:
        assert (g[0], g[1]) in found


def test_ngram_jaccard_exact(spark, dup_corpus):
    df, pdf = dup_corpus
    sub = spark.createDataFrame(pdf.tail(300))  # contains dupes
    pairs = ngram_jaccard_pairs(sub, "content", "doc_id", threshold=0.999)
    rows = pairs.collect()
    by_content = pdf.tail(300).groupby("content")["doc_id"].apply(list)
    n_expected = sum(len(g) * (len(g) - 1) // 2 for g in by_content if len(g) > 1)
    assert len(rows) >= n_expected
    for r in rows:
        assert r.jaccard >= 0.999


def test_hot_cluster_dedup_scale_safety(spark):
    """A 10^4-copy duplicate cluster (the empty-file/license shape real
    corpora have) must not produce O(cluster^2) candidate pairs or an
    unbounded member list (VERDICT r1 #3/#4)."""
    from fastfilter_spark.pipeline import (
        lsh_bucket_stats, minhash_lsh_candidates, simhash_candidates,
    )
    n = 10_000
    pdf = pd.DataFrame({
        "doc_id": range(n + 50),
        "content": ["same license text " * 5] * n
                   + [f"unique doc number {i} words " * 4 for i in range(50)],
    })
    df = spark.createDataFrame(pdf)

    # exact_dedup default output is two scalars per group — no
    # collect_list for a hot key to OOM on
    g = exact_dedup(df, "content", "doc_id")
    assert "member_ids" not in g.columns
    hot = g.where(f"n_copies = {n}").collect()
    assert len(hot) == 1 and hot[0].rep_id == 0

    # capped member list: k smallest ids even for the hot group
    g2 = exact_dedup(df, "content", "doc_id", member_ids_cap=5)
    hot2 = g2.where(f"n_copies = {n}").collect()[0]
    assert hot2.member_ids == [0, 1, 2, 3, 4]

    # dedup-first (minhash_dedup default): the cluster enters LSH as ONE
    # representative, so candidates are O(reps^2) at worst, not ~5*10^7
    reps = distinct_by_content(df, "content", "doc_id")
    n_cands = minhash_lsh_candidates(reps, "content", "doc_id").count()
    assert n_cands < 2_000

    # bucket cap alone also defuses the blow-up: the cluster's buckets
    # (size 10^4) are dropped, everything else survives
    capped = minhash_lsh_candidates(df, "content", "doc_id",
                                    num_hashes=16, bands=8, max_bucket=100)
    assert capped.count() < 2_000
    sim_capped = simhash_candidates(df, "content", "doc_id",
                                    max_hamming=3, max_bucket=100)
    assert sim_capped.count() < 2_000

    # the drop metric reports what the cap removed
    e = spark.createDataFrame(
        [(i, 0, 7) for i in range(10)] + [(99, 1, 9)],
        "id long, band int, bh long")
    st = lsh_bucket_stats(e, max_bucket=5).collect()[0]
    assert (st.n_buckets, st.max_bucket_size, st.n_rows_dropped) == (2, 10, 10)


def test_text_analysis_features(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["the cat sat on the mat, happily!", "x"],
    }))
    out = with_text_analysis(df, "text").collect()
    r1 = [r for r in out if r.doc_id == 1][0]
    assert r1.n_tokens == 7
    assert r1.n_punct == 2   # comma + colon-class: , !
    assert r1.n_stopwords >= 2
    assert r1.lang_pred == "en"
    r2 = [r for r in out if r.doc_id == 2][0]
    assert r2.quality_score < r1.quality_score


def test_lang_id_multilingual(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "t": ["the quick brown fox is over the lazy dog and the end",
              "der Hund ist gut und die Katze ist auch das beste",
              "el perro y la casa que los gatos",
              "le chat et la maison les chiens est grand",
              "这是一个中文句子 机器学习 深度学习"],
    }))
    got = [r.l for r in df.select(lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "es", "fr", "zh"]


def test_brute_force_topk_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy())
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    res = brute_force_topk(emb, emb.where("vec_id < 3"), k=3).toPandas()
    ids = pdf["vec_id"].to_numpy()
    for q in range(3):
        qi = np.where(ids == q)[0][0]
        order = np.lexsort((ids, -sims[qi]))
        expect = ids[order[:3]].tolist()
        got = res[res.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert got == expect, (q, got, expect)


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    exact = brute_force_topk(emb, emb, k=1).toPandas()
    # scale-sane defaults: 8×8-bit bands + Hamming-1 multiprobe
    # (measured 0.688 recall@1 on this data — the old 2-bit bands'
    # higher recall came from examining ~90% of ALL pairs)
    approx = lsh_topk(emb, k=1).toPandas()
    merged = exact.merge(approx, on="query_id", suffixes=("_e", "_a"))
    recall = (merged.neighbor_id_e == merged.neighbor_id_a).mean()
    assert recall > 0.5, recall
    # multiprobe off: fewer candidates, strictly a subset of the
    # probed relation; still runs and returns ≤ n rows per rank
    single = lsh_topk(emb, k=1, multiprobe=0).toPandas()
    assert len(single) <= n


def test_ivf_topk_recall_and_pruning(spark):
    from fastfilter_spark.pipeline import ivf_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 10")
    exact = brute_force_topk(emb, q, k=3).toPandas()
    approx = ivf_topk(emb, q, k=3, n_cells=16, nprobe=8).toPandas()
    exact_pairs = set(zip(exact.query_id, exact.neighbor_id))
    approx_pairs = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, recall
    # full probe (nprobe == n_cells) degenerates to the exact answer
    full = ivf_topk(emb, q, k=3, n_cells=16, nprobe=16).toPandas()
    full_pairs = set(zip(full.query_id, full.neighbor_id))
    assert full_pairs == exact_pairs
    # determinism: same seed → identical result
    again = ivf_topk(emb, q, k=3, n_cells=16, nprobe=8).toPandas()
    assert set(zip(again.query_id, again.neighbor_id)) == approx_pairs


def test_partial_topk_reduction_exact_and_bounded():
    """The per-batch partial top-k (VERDICT r3 #2) must select exactly
    the rows the final (cos desc, neighbor_id asc) window would keep —
    including ties broken by neighbor id — while bounding output to
    m per query per batch."""
    import numpy as np

    from fastfilter_spark.pipeline.ann import _partial_topk

    rng = np.random.default_rng(7)
    sims = rng.standard_normal((200, 5))
    # plant exact ties with different ids: id order must decide
    sims[10, 0] = sims[20, 0] = sims[30, 0] = 2.5
    cids = rng.permutation(200).astype(np.int64)
    m = 4
    bi, qi = _partial_topk(sims, cids, m)
    assert len(bi) == 5 * m                        # bounded: m per query
    for j in range(5):
        sel = bi[qi == j]
        # reference: full sort by (-sim, id), take m
        ref = np.lexsort((cids, -sims[:, j]))[:m]
        assert sorted(sel) == sorted(ref), j
    # tiny batch (≤ m rows): everything passes through
    bi2, qi2 = _partial_topk(sims[:3], cids[:3], m)
    assert len(bi2) == 5 * 3


def test_brute_force_topk_shuffle_rows_bounded(spark):
    """End-to-end: the scored relation entering the top-k window holds
    ≤ partitions × nq × (k+1) rows, not n × nq — and the final result
    equals the unreduced reference computed in numpy."""
    import numpy as np

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .select("vec_id", "embedding").repartition(4).cache())
    q = emb.where("vec_id < 5")
    k = 3
    res = brute_force_topk(emb, q, k=k).toPandas()
    # numpy reference (full cross product)
    pdf = emb.toPandas()
    ids = pdf.vec_id.to_numpy()
    M = np.vstack(pdf.embedding.to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in range(5):
        qv = Mn[ids == qid][0]
        s = Mn @ qv
        mask = ids != qid
        order = np.lexsort((ids[mask], -s[mask]))
        expect = ids[mask][order[:k]].tolist()
        got = res[res.query_id == qid].sort_values("rank") \
                 .neighbor_id.tolist()
        assert got == expect, (qid, got, expect)


def test_ivf_cell_stats_flags_planted_skew(spark):
    """Cell-skew telemetry (VERDICT r3 #7): a corpus that is 80% copies
    of one vector must surface as one cell holding ≥ its fair share
    many times over."""
    from fastfilter_spark.pipeline import (ivf_assign, ivf_cell_stats,
                                           train_ivf_centroids)
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .select("vec_id", "embedding"))
    one = emb.limit(1).select("embedding")
    clones = (spark.range(20_000, 22_000)
              .crossJoin(one).select(F.col("id").alias("vec_id"),
                                     "embedding"))
    skewed = emb.unionByName(clones)
    cents = train_ivf_centroids(skewed, n_cells=8)
    stats = ivf_cell_stats(ivf_assign(skewed, cents)).collect()[0]
    assert stats.n_rows == skewed.count()
    assert stats.max_cell_frac >= 0.5          # the clone cell dominates
    assert stats.max_cell_rows >= 2000
    # balanced corpus: max cell well under the skewed corpus's
    bal = ivf_cell_stats(
        ivf_assign(emb, train_ivf_centroids(emb, n_cells=8))).collect()[0]
    assert bal.max_cell_frac < stats.max_cell_frac


def test_ivf_assign_covers_all_cells_filterable(spark):
    from fastfilter_spark.pipeline import ivf_assign, train_ivf_centroids
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_cells=8)
    assigned = ivf_assign(emb, cents)
    pdf = assigned.select("vec_id", "cell").toPandas()
    assert pdf.cell.between(0, 7).all()
    assert len(pdf) == emb.count()
    # the cell predicate is a plain JVM filter (prunable at the source)
    some = assigned.where(F.col("cell").isin([0, 1])).count()
    assert some == int((pdf.cell < 2).sum())


def test_ivfpq_index_recall_compression_determinism(spark, tmp_path):
    """IVF-PQ (the byte-compression serve path): codes are exactly m
    bytes per vector (vs 4·dim raw), the written index is deterministic
    (same corpus → byte-identical codes), pure-ADC top-k has usable
    recall at full probe, and the exact re-rank stage (refine_with)
    recovers ≥ the plain-IVF recall bar."""
    from fastfilter_spark.pipeline import (ivfpq_topk_from_index,
                                           read_ivfpq_index,
                                           write_ivfpq_index)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "pq_idx")
    m = 16
    cents, books = write_ivfpq_index(emb, idx, n_cells=8, m=m)
    assert books.shape == (m, 256, 64 // m)
    code_df, c2, b2 = read_ivfpq_index(spark, idx)
    np.testing.assert_array_equal(cents, c2)
    np.testing.assert_array_equal(books, b2)
    pdf = code_df.orderBy("vec_id").toPandas()
    n = emb.count()
    assert len(pdf) == n
    assert all(len(c) == m for c in pdf.code)      # m bytes, not 4·dim
    # determinism: rebuild in place → identical codes and cells
    write_ivfpq_index(emb, idx, n_cells=8, m=m)
    pdf2 = spark.read.parquet(idx).orderBy("vec_id").toPandas()
    assert (pdf.code == pdf2.code).all() and (pdf.cell == pdf2.cell).all()

    q = emb.where("vec_id < 10")
    exact = brute_force_topk(emb, q, k=3).toPandas()
    exact_pairs = set(zip(exact.query_id, exact.neighbor_id))
    adc = ivfpq_topk_from_index(spark, idx, q, k=3, nprobe=8).toPandas()
    adc_pairs = set(zip(adc.query_id, adc.neighbor_id))
    assert len(adc_pairs & exact_pairs) / len(exact_pairs) >= 0.5
    ref = ivfpq_topk_from_index(spark, idx, q, k=3, nprobe=8,
                                refine_with=emb).toPandas()
    ref_pairs = set(zip(ref.query_id, ref.neighbor_id))
    # exact re-rank can only improve on the ADC ordering of the same
    # candidate set
    assert len(ref_pairs & exact_pairs) >= len(adc_pairs & exact_pairs)
    assert len(ref_pairs & exact_pairs) / len(exact_pairs) >= 0.5


def test_binary_matrix_handles_slices_and_chunks():
    """_binary_matrix reads straight from the Arrow buffers, so it must
    honor the slice offset a sliced RecordBatch carries (a wrong slice
    would silently score every row against the wrong codes) and reject
    ragged or NULL rows loudly."""
    import pyarrow as pa

    from fastfilter_spark.pipeline.ann import _binary_matrix

    rng = np.random.default_rng(3)
    m = 8
    codes = rng.integers(0, 256, size=(50, m), dtype=np.uint8)
    arr = pa.array([c.tobytes() for c in codes], type=pa.binary())
    np.testing.assert_array_equal(_binary_matrix(arr, m), codes)
    # sliced view: offsets no longer start at 0
    np.testing.assert_array_equal(_binary_matrix(arr.slice(13, 20), m),
                                  codes[13:33])
    # chunked (combine_chunks path)
    ch = pa.chunked_array([arr.slice(0, 10), arr.slice(10, 40)])
    np.testing.assert_array_equal(_binary_matrix(ch, m), codes)
    assert _binary_matrix(arr.slice(5, 0), m).shape == (0, m)
    with pytest.raises(ValueError, match="!= m"):
        _binary_matrix(pa.array([b"short"], type=pa.binary()), m)
    with pytest.raises(ValueError, match="NULL"):
        _binary_matrix(pa.array([codes[0].tobytes(), None],
                                type=pa.binary()), m)


def test_ivfpq_joined_matches_broadcast_path(spark, tmp_path):
    """The join-shaped bulk serve (queries never touch the driver) must
    return the same neighbors as the broadcast probe-plan path on the
    same index — same ADC arithmetic, different distribution shape."""
    from fastfilter_spark.pipeline import (ivfpq_topk_from_index,
                                           ivfpq_topk_joined,
                                           write_ivfpq_index)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "pq_idx_j")
    write_ivfpq_index(emb, idx, n_cells=8, m=16)
    q = emb.where("vec_id < 10")
    a = ivfpq_topk_from_index(spark, idx, q, k=3, nprobe=4).toPandas()
    b = ivfpq_topk_joined(spark, idx, q, k=3, nprobe=4).toPandas()
    want = sorted(zip(a.query_id, a.neighbor_id, a["rank"]))
    got = sorted(zip(b.query_id, b.neighbor_id, b["rank"]))
    assert got == want
    # and the sims agree numerically (gemm vs gemv accumulation)
    ja = a.set_index(["query_id", "neighbor_id"]).adc_sim
    jb = b.set_index(["query_id", "neighbor_id"]).adc_sim
    assert np.allclose(ja.sort_index(), jb.sort_index(), atol=1e-9)
    # full probe: joined == broadcast == every cell scored
    c = ivfpq_topk_joined(spark, idx, q, k=3, nprobe=8).toPandas()
    d = ivfpq_topk_from_index(spark, idx, q, k=3, nprobe=8).toPandas()
    assert sorted(zip(c.query_id, c.neighbor_id, c["rank"])) \
        == sorted(zip(d.query_id, d.neighbor_id, d["rank"]))
    # exact re-rank parity: bulk (shuffle-join) refine returns the same
    # rows as the interactive (broadcast) refine
    e = ivfpq_topk_joined(spark, idx, q, k=3, nprobe=8,
                          refine_with=emb).toPandas()
    f = ivfpq_topk_from_index(spark, idx, q, k=3, nprobe=8,
                              refine_with=emb).toPandas()
    assert sorted(zip(e.query_id, e.neighbor_id, e["rank"])) \
        == sorted(zip(f.query_id, f.neighbor_id, f["rank"]))


def test_ivfpq_guards(spark, tmp_path):
    from fastfilter_spark.pipeline import (read_ivfpq_index,
                                           train_ivf_centroids,
                                           train_pq_codebooks,
                                           write_ivfpq_index)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_cells=4)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(emb, cents, m=7)        # 64 % 7 != 0
    with pytest.raises(ValueError, match="uint8"):
        train_pq_codebooks(emb, cents, m=8, n_codes=512)
    # incomplete index (missing codebooks sidecar) must refuse to serve
    idx = str(tmp_path / "broken")
    write_ivfpq_index(emb, idx, n_cells=4, m=8)
    import os
    os.remove(os.path.join(idx, "_pq_codebooks.npy"))
    with pytest.raises(FileNotFoundError, match="incomplete"):
        read_ivfpq_index(spark, idx)


def test_cosine_near_dups_exact_vs_numpy(spark):
    from fastfilter_spark.pipeline import cosine_near_dups
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T
    iu, ju = np.triu_indices(len(ids), 1)
    want = {(min(int(ids[i]), int(ids[j])), max(int(ids[i]), int(ids[j])))
            for i, j in zip(iu, ju) if sims[i, j] >= 0.35}
    got_df = cosine_near_dups(emb, threshold=0.35, method="exact").toPandas()
    got = set(zip(got_df.id_a, got_df.id_b))
    assert got == want
    # LSH mode returns a subset (candidates are verified exactly);
    # 8×8-bit bands + multiprobe covers 0.708 of true pairs (measured)
    lsh_df = cosine_near_dups(emb, threshold=0.35, method="lsh").toPandas()
    lsh = set(zip(lsh_df.id_a, lsh_df.id_b))
    assert lsh <= want
    assert len(lsh) >= 0.5 * len(want), (len(lsh), len(want))


def test_multimodal_plumbing(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = make_fake_media(docs.limit(20), "doc_id")
    feats = extract_features(media, feat_dim=8).toPandas()
    assert feats.decode_ok.all()
    assert all(len(f) == 8 for f in feats.feat)
    # determinism: same ids → same features
    feats2 = extract_features(media, feat_dim=8).toPandas()
    a = np.vstack(feats.sort_values("media_id").feat.to_numpy())
    b = np.vstack(feats2.sort_values("media_id").feat.to_numpy())
    assert np.array_equal(a, b)
    fs = frame_sample(media.withColumn("n_frames", F.lit(9)), every_n=4)
    assert fs.groupBy("media_id").count().agg(F.min("count")).collect()[0][0] == 3


def test_lsh_topk_rejects_degenerate_banding(spark):
    """bands > n_bits would put every vector in bucket 0 — the full
    O(n^2) cross product LSH exists to avoid. Must raise. Likewise
    <8-bit bands (≤256 buckets/band ⇒ Θ(n²/2^bits) bucket joins — the
    r3 hazard VERDICT #1 flagged) and bogus multiprobe values."""
    from fastfilter_spark.pipeline import cosine_near_dups, lsh_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="multiple of bands"):
        lsh_topk(emb, n_bits=4, bands=8)
    with pytest.raises(ValueError, match="multiple of bands"):
        lsh_topk(emb, n_bits=10, bands=4)
    with pytest.raises(ValueError, match="band hash width"):
        lsh_topk(emb, n_bits=16, bands=8)        # 2-bit bands: the r3 bug
    with pytest.raises(ValueError, match="band hash width"):
        cosine_near_dups(emb, method="lsh", n_bits=16, bands=4)
    with pytest.raises(ValueError, match="multiprobe"):
        lsh_topk(emb, multiprobe=2)


def test_lsh_topk_pathological_bucket_capped(spark):
    """A mega-cluster of identical vectors collides in EVERY band: with
    no cap the bucket self-join is m² (the disguised cartesian). The
    max_bucket cap must bound candidate volume linearly and still
    return results for the well-behaved vectors."""
    from fastfilter_spark.pipeline import lsh_topk
    from fastfilter_spark.pipeline.dedup import lsh_bucket_stats
    from fastfilter_spark.pipeline.ann import (_band_structs,
                                               hyperplane_signatures)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
               .select("vec_id", "embedding")
    # plant 300 copies of one vector (ids beyond the real id range)
    one = emb.limit(1).select("embedding")
    clones = (spark.range(10_000, 10_300)
              .crossJoin(one).select(F.col("id").alias("vec_id"),
                                     "embedding"))
    corpus = emb.unionByName(clones)
    res = lsh_topk(corpus, k=3, max_bucket=50).toPandas()
    # bounded: every query returns ≤ k rows; the job completes without
    # materializing the 300² clone cross-product (cap drops the bucket)
    assert res.groupby("query_id").size().max() <= 3
    # the drop metric sees the oversized buckets
    sigs = hyperplane_signatures(corpus, "embedding", "vec_id", 64, 64, 42)
    e = (sigs.select("id", F.explode(
            _band_structs(F.col("sig"), 8, 8, False)).alias("b"))
         .select("id", "b.band", "b.bh"))
    stats = lsh_bucket_stats(e, max_bucket=50).collect()[0]
    assert stats.n_rows_dropped >= 300 * 8  # the clone bucket, all bands
    # clones are gone from results (their buckets were dropped from the
    # index AND their probe rows exceeded the probe cap)
    clone_hits = res[res.query_id >= 10_000]
    assert len(clone_hits) == 0 or clone_hits.neighbor_id.max() < 10_000


def test_simhash_kernel_matches_per_doc_reference(spark):
    """The flattened segment-reduce simhash kernel must be bit-identical
    to the straightforward per-doc majority-vote definition, including
    null docs, empty docs, and Arrow slicing edge cases."""
    from fastfilter_spark.pipeline.dedup import _simhash_segments

    rng = np.random.default_rng(11)
    docs = []
    for i in range(500):
        L = int(rng.integers(0, 40))
        if i % 37 == 0:
            docs.append(None)
        else:
            docs.append(rng.integers(-2**63, 2**63, size=L, dtype=np.int64))
    # trailing empty/null docs: a clamped reduceat start used to truncate
    # the PRECEDING doc's segment (caught in review — keep these last)
    docs[-3] = rng.integers(-2**63, 2**63, size=5, dtype=np.int64)
    docs[-2] = np.empty(0, dtype=np.int64)
    docs[-1] = None

    # reference: per-doc bit-matrix majority (the old v1 kernel)
    bitw = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    exp = np.zeros(len(docs), dtype=np.int64)
    for i, hs in enumerate(docs):
        if hs is None or len(hs) == 0:
            continue
        h = np.asarray(hs, dtype=np.int64).view(np.uint64)
        score = ((h[:, None] & bitw[None, :]) != 0).sum(axis=0) * 2 - len(h)
        exp[i] = np.int64((bitw[score > 0]).sum(dtype=np.uint64)
                          .astype(np.uint64).view(np.int64))

    lens = np.array([0 if d is None else len(d) for d in docs])
    offs = np.concatenate(([0], np.cumsum(lens)))
    flat = (np.concatenate([d for d in docs if d is not None and len(d)])
            if lens.sum() else np.empty(0, np.int64))
    valid = np.array([d is not None for d in docs])
    got = _simhash_segments(flat, offs, valid)
    assert np.array_equal(got, exp)

    # through Spark/Arrow too (null + empty docs in the column)
    rows = [(i, None if d is None else [int(x) for x in d])
            for i, d in enumerate(docs[:100])]
    df = spark.createDataFrame(rows, "doc_id long, th array<long>")
    from fastfilter_spark.pipeline.dedup import _simhash_map
    out = (_simhash_map(df.select(F.col("doc_id").alias("id"), "th"),
                        ["th"], ["simhash"])
           .toPandas().set_index("id")["simhash"])
    for i in range(100):
        assert out[i] == exp[i]


def test_ngram_jaccard_block_guard(spark):
    """Blocks larger than max_block_rows are dropped before the
    quadratic self-join — an accidental corpus-scale block (e.g.
    blocking on lang) must not cartesian."""
    rows = ([(i, "big", f"common shared text number {i % 7}")
             for i in range(200)]          # oversized block: dropped
            + [(1000, "small", "alpha beta gamma delta"),
               (1001, "small", "alpha beta gamma delta")])
    df = spark.createDataFrame(rows, "doc_id long, lang string, content string")
    pairs = ngram_jaccard_pairs(df, "content", "doc_id", block_col="lang",
                                threshold=0.5, max_block_rows=100).toPandas()
    assert set(zip(pairs.id_a, pairs.id_b)) == {(1000, 1001)}
    # guard off: the big block's pairs come back
    allp = ngram_jaccard_pairs(df, "content", "doc_id", block_col="lang",
                               threshold=0.5, max_block_rows=None)
    assert allp.count() > 1


def test_bmp_wav_codecs_roundtrip():
    """The pure-numpy BMP/WAV codecs must round-trip arbitrary content,
    including odd widths (4-byte row padding) and negative samples."""
    from fastfilter_spark.pipeline import (decode_bmp, decode_wav,
                                           encode_bmp, encode_wav)
    rng = np.random.default_rng(3)
    for h, w in [(64, 64), (7, 5), (1, 1), (3, 13)]:   # 5,13 → padded rows
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    for n in [3072, 7, 1]:
        s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        rate, back = decode_wav(encode_wav(s, 8000))
        assert rate == 8000 and np.array_equal(back, s)
    # stereo WAVs downmix to mono
    st = np.array([100, 200, -100, -200], dtype=np.int16)   # 2 frames, 2ch
    import struct as _struct
    fmt = _struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (b"WAVE" + b"fmt " + _struct.pack("<I", 16) + fmt
            + b"data" + _struct.pack("<I", 8) + st.tobytes())
    rate, mono = decode_wav(b"RIFF" + _struct.pack("<I", len(body)) + body)
    assert list(mono) == [150, -150]


def test_bmp_wav_decode_rejects_garbage():
    from fastfilter_spark.pipeline import decode_bmp, decode_wav
    for bad in [b"", b"XX" + b"\x00" * 60, b"BM" + b"\x00" * 20]:
        with pytest.raises(ValueError):
            decode_bmp(bad)
    for bad in [b"", b"RIFF\x00\x00\x00\x00WAVX", b"RIFF\x04\x00\x00\x00WAVE"]:
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_multimodal_real_decode_and_error_isolation(spark):
    """make_fake_media now emits REAL BMP/WAV payloads; extract_features
    must decode them (not tile bytes), match the analytic expectation,
    and isolate corrupt rows without killing the task."""
    import hashlib
    from fastfilter_spark.pipeline import decode_bmp

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = make_fake_media(docs.limit(10), "doc_id")
    rows = media.orderBy("media_id").collect()
    # payload IS a BMP whose pixels are the tiled digest
    for r in rows[:3]:
        px = decode_bmp(bytes(r.payload))
        digest = np.frombuffer(
            hashlib.sha256(str(r.media_id).encode()).digest(), np.uint8)
        assert px.shape == (64, 64, 3)
        assert np.array_equal(px.ravel(), np.tile(digest, 384))

    feats = extract_features(media, feat_dim=8).toPandas()
    assert feats.decode_ok.all()
    for _, row in feats.iterrows():
        digest = np.frombuffer(
            hashlib.sha256(str(row.media_id).encode()).digest(), np.uint8)
        assert np.allclose(row.feat, digest.mean(), atol=0)  # exact

    # audio: WAV samples are the digest's int16s tiled
    am = make_fake_media(docs.limit(10), "doc_id", kind="audio")
    af = extract_features(am, feat_dim=8).toPandas()
    assert af.decode_ok.all()
    for _, row in af.iterrows():
        d16 = np.frombuffer(
            hashlib.sha256(str(row.media_id).encode()).digest(), "<i2")
        assert np.allclose(row.feat, d16.mean(), atol=0)

    # corrupt one payload: that row fails, others survive
    corrupted = media.withColumn(
        "payload", F.when(F.col("media_id") == rows[0].media_id,
                          F.lit(b"garbage")).otherwise(F.col("payload")))
    cf = extract_features(corrupted, feat_dim=8).toPandas() \
        .set_index("media_id")
    assert not cf.loc[rows[0].media_id, "decode_ok"]
    assert cf.loc[rows[0].media_id, "err"]
    assert cf.drop(index=rows[0].media_id).decode_ok.all()


def test_simhash_list_array_sliced():
    """_simhash_list_array must honor Arrow slice offsets (offsets base
    nonzero, values child longer than the slice)."""
    from fastfilter_spark.pipeline.dedup import _simhash_list_array
    rng = np.random.default_rng(5)
    docs = [rng.integers(-2**63, 2**63, size=int(rng.integers(1, 20)),
                         dtype=np.int64) for _ in range(10)]
    docs[4] = None
    docs[9] = np.empty(0, np.int64)
    import pyarrow as pa
    arr = pa.array([None if d is None else d.tolist() for d in docs],
                   type=pa.list_(pa.int64()))
    full = _simhash_list_array(arr)
    assert np.array_equal(_simhash_list_array(arr.slice(3, 5)), full[3:8])


def test_wav_decode_rejects_truncated_chunks():
    """A data chunk whose declared length runs past the buffer is
    corruption, not a short read — decode must raise so extract_features
    marks the row decode_ok=False instead of pooling wrong features."""
    from fastfilter_spark.pipeline import decode_wav, encode_wav
    good = encode_wav(np.arange(100, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_wav(good[:-4])
    # truncated fmt chunk too
    with pytest.raises(ValueError):
        decode_wav(good[:20])


def test_avi_codec_roundtrip_and_rejects_corruption():
    """The pure-numpy AVI codec must round-trip arbitrary frame stacks
    (incl. odd widths → padded DIB rows) and raise — never silently
    mis-decode — on truncation, wrong form type, frame-count mismatch
    and compressed streams."""
    import struct as _struct
    from fastfilter_spark.pipeline import decode_avi, encode_avi

    rng = np.random.default_rng(11)
    for n, h, w in [(1, 16, 16), (7, 9, 7), (3, 1, 1), (4, 5, 2)]:
        fr = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_avi(encode_avi(fr, fps=4)), fr)

    good = encode_avi(rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8))
    for bad, why in [(None, "none"), (b"", "empty"),
                     (good[:40], "truncated file"),
                     (good[:-10], "truncated tail"),
                     (b"RIFF" + good[4:8] + b"WAVE" + good[12:], "form")]:
        with pytest.raises(ValueError):
            decode_avi(bad), why
    # header/frame-count mismatch (a silently dropped tail must raise)
    flipped = bytearray(good)
    _struct.pack_into("<I", flipped, good.find(b"avih") + 8 + 16, 5)
    with pytest.raises(ValueError, match="frame count mismatch"):
        decode_avi(bytes(flipped))
    # compressed frames are out of scope and must say so
    comp = good.replace(b"00db", b"00dc")
    with pytest.raises(ValueError, match="compressed"):
        decode_avi(comp)


def test_video_real_decode_and_error_isolation(spark):
    """make_fake_media(kind='video') emits REAL uncompressed AVIs:
    frame_sample(decode=True) must decode the true frame count, match
    the analytic per-frame mean, and isolate corrupt payloads per-row;
    extract_features pools video to the digest mean like image/audio."""
    import hashlib
    from fastfilter_spark.pipeline import decode_avi, frame_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = make_fake_media(docs.limit(15), "doc_id", kind="video")
    rows = media.orderBy("media_id").collect()
    for r in rows[:4]:
        frames = decode_avi(bytes(r.payload))
        assert frames.shape == (r.media_id % 7 + 1, 16, 16, 3)
        digest = np.frombuffer(
            hashlib.sha256(str(r.media_id).encode()).digest(), np.uint8)
        assert np.array_equal(frames.ravel(),
                              np.tile(digest, frames.size // 32))

    fs = frame_sample(media, every_n=2, decode=True).toPandas()
    assert fs.decode_ok.all()
    for _, row in fs.iterrows():
        digest = np.frombuffer(
            hashlib.sha256(str(row.media_id).encode()).digest(), np.uint8)
        assert row.frame_mean == round(float(digest.mean()), 6)
        assert row.frame_idx % 2 == 0
    # sampled count = ceil(n_frames / 2), driven by the DECODED count
    got = fs.groupby("media_id").size()
    for r in rows:
        assert got[r.media_id] == -(-(r.media_id % 7 + 1) // 2)

    vf = extract_features(media, feat_dim=8).toPandas()
    assert vf.decode_ok.all()
    for _, row in vf.iterrows():
        digest = np.frombuffer(
            hashlib.sha256(str(row.media_id).encode()).digest(), np.uint8)
        assert np.allclose(row.feat, digest.mean(), atol=0)  # exact

    # corrupt one payload: that row fails, others survive
    victim = rows[0].media_id
    corrupted = media.withColumn(
        "payload", F.when(F.col("media_id") == victim,
                          F.lit(b"garbage")).otherwise(F.col("payload")))
    cf = (frame_sample(corrupted, every_n=2, decode=True).toPandas()
          .set_index("media_id"))
    bad = cf.loc[victim]
    assert not bad.decode_ok and bad.frame_idx == -1
    assert cf.drop(index=victim).decode_ok.all()


def test_contamination_flags_exact(spark):
    """Planted benchmark overlap must be found exactly: n_hits equals
    the true distinct-shingle intersection (filter FP candidates are
    removed by the confirm join), clean docs stay unflagged."""
    from fastfilter_spark.pipeline import contamination_flags

    bench_text = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [(0, bench_text)]                      # the benchmark doc
    rows += [(1, "prefix words then " + bench_text + " plus a tail here"),
             (2, "totally unrelated content about something else entirely "
                 "with many distinct words one two three four five six")]
    rows += [(3, bench_text)]                     # exact copy
    train = spark.createDataFrame(rows, "doc_id long, text string")
    bench = train.where("doc_id = 0")

    out = contamination_flags(train, bench, "text", "doc_id",
                              shingle_k=4, min_hits=2).toPandas() \
        .set_index("id").sort_index()
    # doc 0/3: every shingle hits; doc 1 contains all of bench's 7
    # 4-gram shingles; doc 2: zero hits
    assert bool(out.loc[0, "contaminated"]) and bool(out.loc[3, "contaminated"])
    assert bool(out.loc[1, "contaminated"])
    assert out.loc[1, "n_hits"] == 7              # exact count, no FPs
    assert out.loc[2, "n_hits"] == 0 and not out.loc[2, "contaminated"]


def test_repetition_stats_flags_degenerate_docs(spark):
    from fastfilter_spark.pipeline import repetition_stats

    rows = [(0, "spam spam spam spam spam spam"),           # 1 distinct word
            (1, "buy now buy now buy now buy now"),         # dominant bigram
            (2, "a perfectly normal sentence with unique words only"),
            (3, "")]                                        # empty doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_stats(df, "text", "doc_id").toPandas() \
        .set_index("id").sort_index()
    assert out.loc[0, "dup_word_frac"] > 0.8
    # "buy now" is 4 of 7 bigrams
    assert abs(out.loc[1, "top_bigram_frac"] - 4 / 7) < 1e-9
    assert out.loc[2, "dup_word_frac"] == 0.0
    assert out.loc[2, "top_bigram_frac"] < 0.2
    # empty doc: NO phantom bigram, both signals 0 (not maximally bad)
    assert out.loc[3, "n_tokens"] == 0
    assert out.loc[3, "dup_word_frac"] == 0.0
    assert out.loc[3, "top_bigram_frac"] == 0.0


def test_repetition_stats_duplicate_line_signals(spark):
    from fastfilter_spark.pipeline import repetition_stats

    boiler = "all rights reserved"
    rows = [(0, "unique one\nunique two\nunique three"),
            (1, f"{boiler}\nreal content here\n{boiler}\n{boiler}"),
            (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_stats(df, "text", "doc_id").toPandas() \
        .set_index("id").sort_index()
    assert out.loc[0, "dup_line_frac"] == 0.0
    assert out.loc[0, "dup_line_char_frac"] == 0.0
    # doc 1: 4 lines, 2 surplus copies of the boilerplate line
    assert abs(out.loc[1, "dup_line_frac"] - 2 / 4) < 1e-9
    chars = 3 * len(boiler) + len("real content here")
    assert abs(out.loc[1, "dup_line_char_frac"]
               - 2 * len(boiler) / chars) < 1e-9
    # empty doc: one empty line, nothing duplicated
    assert out.loc[2, "dup_line_frac"] == 0.0
    assert out.loc[2, "dup_line_char_frac"] == 0.0


def test_ivf_index_partition_pruning(spark, tmp_path):
    """write_ivf_index → ivf_topk_from_index must (a) return exactly
    what the in-memory ivf_topk returns for the same centroids, (b)
    prune the scan on the cell PARTITION column at plan time — the
    whole point of persisting the assignment — and (c) refuse an
    incomplete index (missing centroids sidecar)."""
    import os
    import re

    from fastfilter_spark.pipeline import (ivf_topk, ivf_topk_from_index,
                                           read_ivf_index, write_ivf_index)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf_idx")
    cents = write_ivf_index(emb, idx, n_cells=8, seed=42)
    q = emb.where("vec_id < 5")
    got = ivf_topk_from_index(spark, idx, q, k=3, nprobe=4)
    want = ivf_topk(emb, q, k=3, nprobe=4, centroids=cents)
    cols = ["query_id", "neighbor_id", "rank"]
    gp = got.toPandas().sort_values(cols)[cols].reset_index(drop=True)
    wp = want.toPandas().sort_values(cols)[cols].reset_index(drop=True)
    assert gp.equals(wp)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*cell", plan), plan[:2000]

    # cell-clustered layout: ~one parquet file per cell directory, not
    # writer-tasks × cells tiny files (the r5 measured regression: 8k
    # files made the pruned probe slower than brute force)
    import glob
    cell_dirs = glob.glob(os.path.join(idx, "cell=*"))
    assert cell_dirs
    for d in cell_dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d

    # interrupted write (sidecar is written last) must be refused
    os.remove(os.path.join(idx, "_ivf_centroids.npy"))
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="incomplete"):
        read_ivf_index(spark, idx)


def test_redact_pii_exact(spark):
    """redact_pii must scrub emails/IPs/phones with typed tokens, count
    per kind, pass NULL through (SQL semantics) — and must NOT destroy
    non-PII numerics (dates, timestamps, IDs, decimals): a scrub that
    corrupts the data it protects is worse than none."""
    from fastfilter_spark.pipeline import redact_pii

    rows = [
        (0, "write to alice.smith+x@sub.example.co.uk today"),
        (1, "server at 192.168.0.254 port"),
        (2, "call +44 (0)20-7946 0958 or 555 123 4567"),
        (3, "no pii here"),
        (4, "mix a@b.io then 10.0.0.1 then +1 202 555 0101"),
        (5, None),
        (6, "date 2024-01-02 03:04 id 12345678 pi=3.14159265 v2.10.3"),
        (7, "(555) 123-4567 x2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}

    def phones(r):
        return r.n_phone_intl + r.n_phone_nanp

    assert out[0].redacted == "write to <EMAIL> today"
    assert out[0].n_email == 1 and out[0].n_ip == 0 and phones(out[0]) == 0
    assert out[1].redacted == "server at <IP> port"
    assert phones(out[2]) == 2
    assert "0958" not in out[2].redacted and "4567" not in out[2].redacted
    assert out[3].redacted == "no pii here"
    assert (out[3].n_email, out[3].n_ip, phones(out[3])) == (0, 0, 0)
    assert out[4].redacted == "mix <EMAIL> then <IP> then <PHONE>"
    assert out[4].n_email == 1 and out[4].n_ip == 1 and phones(out[4]) == 1
    assert out[5].redacted is None and out[5].n_email is None
    # non-PII numerics survive byte-identical (the r4 review regression)
    assert out[6].redacted == rows[6][1] and phones(out[6]) == 0
    assert out[7].redacted == "<PHONE> x2" and phones(out[7]) == 1


def test_redact_pii_ssn_cc_ipv6(spark):
    """The r5 widened kinds: SSN shape, Luhn-gated credit cards (valid
    redacted, invalid digit runs preserved — the checksum is the whole
    point), IPv6 full + compressed; and the non-PII survivors stay
    byte-identical."""
    from fastfilter_spark.pipeline import redact_pii

    rows = [
        (0, "ssn 219-09-9999 filed"),
        (1, "card 4111 1111 1111 1111 paid"),        # Luhn-valid grouped
        (2, "bare 5500005555555559 wire"),           # Luhn-valid bare
        (3, "order 4111 1111 1111 1112 kept"),       # Luhn-INVALID
        (4, "serial 1234567890123 build"),           # 13 digits, invalid
        (5, "via 2001:db8::8a2e:370:7334 gw"),       # compressed IPv6
        (6, "full 2001:0db8:85a3:0000:0000:8a2e:0370:7334 end"),
        (7, "amex 378282246310005 ok"),              # 15-digit bare Amex
        (8, "date 2024-01-02 and 555-123-4567 call"),  # NANP, not SSN
        (9, "time 12:30:45 ratio a:b code std::vector"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}

    assert out[0].redacted == "ssn <SSN> filed" and out[0].n_ssn == 1
    assert out[1].redacted == "card <CC> paid" and out[1].n_cc == 1
    assert out[2].redacted == "bare <CC> wire" and out[2].n_cc == 1
    assert out[3].redacted == rows[3][1] and out[3].n_cc == 0
    assert out[4].redacted == rows[4][1] and out[4].n_cc == 0
    assert out[5].redacted == "via <IP6> gw" and out[5].n_ip6c == 1
    assert out[6].redacted == "full <IP6> end" and out[6].n_ip6 == 1
    assert out[7].redacted == "amex <CC> ok" and out[7].n_cc == 1
    assert out[8].redacted == "date 2024-01-02 and <PHONE> call"
    assert out[8].n_ssn == 0
    assert out[9].redacted == rows[9][1]
    assert (out[9].n_ip6, out[9].n_ip6c) == (0, 0)


def test_connected_components_chain_and_isolates(spark):
    """Alternating large-star/small-star must close transitive chains
    (a-b, b-c → one component), keep disjoint components apart, be
    deterministic (component = min member id), and keep self-loop-only
    vertices as their own singleton component."""
    from fastfilter_spark.pipeline import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain → component 1
         (10, 11),                         # separate pair → component 10
         (20, 21), (21, 22), (20, 22),     # triangle → component 20
         (30, 30),                         # self-loop only → singleton
         (40, None), (None, None)],        # NULL-paired → singleton 40
        "id_a long, id_b long")
    got = {r.id: r.comp for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 40: 40}

    # non-convergence guard fires on an adversarial bound
    import pytest as _pytest
    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(long_chain, max_iter=1)


def test_connected_components_long_chain_log_rounds(spark):
    """A 1000-vertex path — the shape that killed O(diameter) min-label
    propagation (1000 rounds) — must converge in O(log d) alternating
    rounds (VERDICT r3 #6): ≤ 10 rounds, exact labels."""
    from fastfilter_spark.pipeline import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long")
    stats: dict = {}
    out = connected_components(edges, stats=stats)
    assert stats["rounds"] <= 10, stats
    rows = out.collect()
    assert len(rows) == 1000
    assert all(r.comp == 0 for r in rows)
    assert {r.id for r in rows} == set(range(1000))


def test_keep_best_per_cluster(spark):
    from fastfilter_spark.pipeline import keep_best_per_cluster

    rows = [(1, 10.0), (2, 30.0), (3, 20.0), (4, 5.0),
            (5, None), (6, None), (7, 99.0)]
    df = spark.createDataFrame(rows, "id long, score double")
    # clusters: {1,2,3} via a chain, {5,6} all-NULL scores; 4 and 7 are
    # singletons (never appear in a pair)
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)],
                                  "id_a long, id_b long")
    stats = {}
    out = keep_best_per_cluster(df, pairs, "id", "score",
                                stats=stats).toPandas()
    assert stats["rounds"] >= 1
    assert len(out) == len(rows)
    by_id = out.set_index("id")
    assert by_id.loc[1, "component"] == 1 and by_id.loc[3, "component"] == 1
    assert by_id.loc[1, "cluster_size"] == 3
    # 2 = max score in its cluster; 5 = min id of the all-NULL cluster;
    # singletons represent themselves
    assert set(out[out.is_rep]["id"]) == {2, 5, 4, 7}
    assert (out.groupby("component")["is_rep"].sum() == 1).all()
    assert by_id.loc[4, "component"] == 4 and by_id.loc[4, "cluster_size"] == 1
    # dangling pair endpoints absent from df never create rows
    pairs2 = spark.createDataFrame([(1, 2), (100, 101)],
                                   "id_a long, id_b long")
    assert keep_best_per_cluster(df, pairs2, "id", "score").count() == len(rows)


def test_keep_best_null_ids_pass_through(spark):
    """Rows with NULL ids cannot cluster (NULL never equi-joins) but
    must NOT be silently dropped: they come back as singleton
    self-representatives with component NULL."""
    from fastfilter_spark.pipeline import keep_best_per_cluster

    df = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (None, 5.0), (None, 7.0)],
        "id long, score double")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = keep_best_per_cluster(df, pairs, "id", "score").toPandas()
    assert len(out) == 4                       # nothing dropped
    nulls = out[out["id"].isna()]
    assert len(nulls) == 2
    assert nulls["is_rep"].all()
    assert (nulls["cluster_size"] == 1).all()
    assert nulls["component"].isna().all()
    reps = out[out["is_rep"]]
    assert set(reps[~reps["id"].isna()]["id"]) == {2.0}


def test_ann_nan_vectors_never_rank(spark):
    """A corrupt (NaN-component) corpus vector gives NaN cosine against
    everything; Spark ranks NaN above every double in a desc window, so
    unsanitized it would be the rank-1 neighbor of every query and a
    universal 'near-duplicate'. All three paths must exclude it."""
    import math
    from fastfilter_spark.pipeline import (brute_force_topk,
                                           cosine_near_dups, lsh_topk)

    rows = []
    for i in range(40):
        v = [0.0] * 8
        v[i % 8] = 1.0
        v[(i + 1) % 8] = 0.5
        rows.append((i, v))
    rows.append((999, [float("nan")] * 8))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    bf = brute_force_topk(df, df.where("vec_id < 3"), "embedding",
                          "vec_id", k=3).toPandas()
    assert 999 not in set(bf["neighbor_id"])
    assert not bf["cos_sim"].isna().any()
    assert not bf["cos_sim"].map(math.isinf).any()

    nd = cosine_near_dups(df, "embedding", "vec_id", threshold=0.5,
                          method="exact", dim=8).toPandas()
    assert 999 not in set(nd["id_a"]) | set(nd["id_b"])
    assert not nd["cos_sim"].isna().any()

    lt = lsh_topk(df, "embedding", "vec_id", k=3, n_bits=16, bands=2,
                  dim=8, max_bucket=None).toPandas()
    assert 999 not in set(lt["neighbor_id"])
    assert not lt["cos_sim"].isna().any()


def test_make_fake_media_negative_ids_consistent(spark):
    """Spark % follows the dividend's sign; the payload uses Python's
    floored %. n_frames metadata must equal the real decoded frame
    count for negative ids too (pmod fix)."""
    from fastfilter_spark.pipeline import decode_avi, make_fake_media

    df = spark.createDataFrame([(-1,), (-6,), (3,)], "doc_id long")
    media = make_fake_media(df, "doc_id", kind="video").toPandas()
    for _, r in media.iterrows():
        assert r["n_frames"] >= 1
        assert decode_avi(bytes(r["payload"])).shape[0] == r["n_frames"]


def test_shingles_empty_docs_no_phantom(spark):
    """Empty/NULL documents must yield ZERO shingles — the unguarded
    window emitted one xxhash64('') phantom that decontamination then
    treated as an n-gram shared by every empty doc."""
    from fastfilter_spark.pipeline import contamination_flags
    from fastfilter_spark.pipeline.text import doc_fingerprint, shingles

    df = spark.createDataFrame(
        [(1, "some real document text here"), (2, ""), (3, None),
         (4, "   ")],
        "doc_id long, text string")
    sh = {r.doc_id: r.sh for r in
          df.select("doc_id", shingles("text", 3).alias("sh")).collect()}
    assert len(sh[1]) >= 1
    assert sh[2] == [] and sh[4] == []
    assert sh[3] == []
    fp = {r.doc_id: r.fp for r in
          df.select("doc_id", doc_fingerprint("text").alias("fp")).collect()}
    assert fp[2] is None and fp[3] is None
    # decontam: an empty benchmark row must not contaminate empty docs
    bench = spark.createDataFrame([(100, "")], "doc_id long, text string")
    flags = contamination_flags(df, bench, "text", "doc_id",
                                min_hits=1).toPandas()
    empty_ids = {2, 3, 4}
    assert not flags[flags["id"].isin(empty_ids)]["contaminated"].any()


def test_distributed_ivf_trainer_reaches_1024_cells(spark):
    """VERDICT r4 #1: the executor-side trainer must reach cell counts
    no driver sample can (the driver trainer now refuses them), without
    collecting anything proportional to the corpus, deterministically."""
    import numpy as np
    from fastfilter_spark.pipeline import (
        ivf_assign, ivf_topk, train_ivf_centroids,
        train_ivf_centroids_distributed)

    dim = 16
    emb = (spark.range(0, 6000, 1, 8)
           .select(F.col("id").alias("vec_id"),
                   F.array(*[((F.pmod(F.xxhash64("id", F.lit(i)),
                                      F.lit(2000)) - 1000)
                              .cast("float") / 1000.0)
                             for i in range(dim)]).alias("embedding")))
    n_cells = 1024
    # the driver trainer refuses — its sample cannot place 1024 cells
    with pytest.raises(ValueError, match="distributed"):
        train_ivf_centroids(emb, n_cells=n_cells)
    cents = train_ivf_centroids_distributed(emb, n_cells=n_cells, iters=2)
    assert cents.shape == (n_cells, dim)
    norms = np.linalg.norm(cents, axis=1)
    assert np.allclose(norms[norms > 0], 1.0)
    # deterministic across reruns on the same input
    again = train_ivf_centroids_distributed(emb, n_cells=n_cells, iters=2)
    assert np.array_equal(cents, again)
    # the trained quantizer actually spreads the corpus over many cells
    used = (ivf_assign(emb, cents).select("cell").distinct().count())
    assert used >= n_cells // 4
    # and serves queries end-to-end (recall vs brute force on a probe
    # wide enough to cover the true neighbors' cells most of the time)
    q = emb.where("vec_id < 10")
    res = ivf_topk(emb, q, k=3, nprobe=64, centroids=cents).toPandas()
    assert set(res.query_id.unique()) == set(range(10))
    assert (res.groupby("query_id")["rank"].max() == 3).all()


def test_semantic_dedup_one_call(spark):
    """semantic_dedup == hand-chained cosine_near_dups →
    connected_components → keep_best_per_cluster, plus the reserved-name
    guard and score-based representative selection."""
    from fastfilter_spark.pipeline import (cosine_near_dups,
                                           keep_best_per_cluster,
                                           semantic_dedup)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    out = semantic_dedup(emb, threshold=0.35, method="exact").toPandas()
    assert {"component", "cluster_size", "is_rep"} <= set(out.columns)
    assert len(out) == emb.count()
    # hand-chained reference gives the identical clustering + reps
    pairs = cosine_near_dups(emb, threshold=0.35, method="exact")
    ref = keep_best_per_cluster(
        emb.withColumn("__s", F.lit(None).cast("double")),
        pairs, "vec_id", "__s").drop("__s").toPandas()
    key = ["vec_id", "component", "cluster_size", "is_rep"]
    assert out[key].sort_values("vec_id").reset_index(drop=True).equals(
        ref[key].sort_values("vec_id").reset_index(drop=True))
    # min-id representative within every multi-member cluster
    multi = out[out.cluster_size > 1]
    if len(multi):
        reps = multi[multi.is_rep].groupby("component").vec_id.min()
        mins = multi.groupby("component").vec_id.min()
        assert reps.equals(mins)
    # score-based pick: highest label wins its cluster
    scored = semantic_dedup(emb, score_col="label", threshold=0.35,
                            method="exact").toPandas()
    for comp, grp in scored[scored.cluster_size > 1].groupby("component"):
        best = grp.sort_values(["label", "vec_id"],
                               ascending=[False, True]).iloc[0]
        assert grp[grp.is_rep].vec_id.iloc[0] == best.vec_id
    # lsh mode runs end-to-end and recovers most exact clusters
    lsh = semantic_dedup(emb, threshold=0.35, method="lsh").toPandas()
    exact_dups = int((~out.is_rep).sum())
    lsh_dups = int((~lsh.is_rep).sum())
    assert lsh_dups <= exact_dups           # LSH can only miss edges
    if exact_dups:
        assert lsh_dups >= exact_dups * 0.5
    # reserved working names fail loud
    with pytest.raises(ValueError, match="reserved"):
        semantic_dedup(emb.withColumn("component", F.lit(1)))


def test_upsample_huge_factor_fails_loud(spark):
    """A factor that would explode ≥2^31 copies per row must raise
    in-plan (the old int cast wrapped negative and sequence()
    auto-descended into bogus negative copy ids)."""
    from fastfilter_spark.spark import upsample
    df = spark.range(0, 3).select(F.col("id").alias("doc_id"))
    big = upsample(df, F.lit(5e9), "doc_id")
    with pytest.raises(Exception, match="cap factors upstream"):
        big.count()
    # normal factors still work and copy ids stay non-negative
    ok = upsample(df, F.lit(2.0), "doc_id").toPandas()
    assert (ok["copy"] >= 0).all() and len(ok) >= 6


def test_list_matrix_arrow_edges():
    """The Arrow-native matrix helper (VERDICT r4 #2): regular batches
    reshape zero-copy, null rows become zero vectors (the old per-row
    contract), sliced arrays respect their offset, ragged non-null rows
    fail loud."""
    import numpy as np
    import pyarrow as pa
    from fastfilter_spark.pipeline.ann import _list_matrix

    reg = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                   type=pa.list_(pa.float32()))
    m = _list_matrix(reg, 2)
    assert m.dtype == np.float64
    assert np.array_equal(m, [[1, 2], [3, 4], [5, 6]])
    # null row → zeros
    withnull = pa.array([[1.0, 2.0], None, [5.0, 6.0]],
                        type=pa.list_(pa.float32()))
    m2 = _list_matrix(withnull, 2)
    assert np.array_equal(m2, [[1, 2], [0, 0], [5, 6]])
    # sliced view (non-zero array offset) must honor its offsets
    m3 = _list_matrix(reg.slice(1, 2), 2)
    assert np.array_equal(m3, [[3, 4], [5, 6]])
    # ragged non-null row → loud error, never silent zeros
    ragged = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="length"):
        _list_matrix(ragged, 2)
    # empty batch
    assert _list_matrix(pa.array([], type=pa.list_(pa.float32())), 2) \
        .shape == (0, 2)


def test_pd_to_u64_float_batches():
    """NULL-degraded int64 batches (exact floats) convert losslessly;
    genuinely fractional keys and >2^53 magnitudes both fail loud."""
    import numpy as np
    import pandas as pd
    from fastfilter_spark.workerside import pd_to_u64

    ints = pd.Series([1, 2, 3], dtype="int64")
    assert pd_to_u64(ints).dtype == np.uint64
    # exact float batch (what Arrow produces for int64-with-NULL)
    exact = pd.Series([1.0, None, 4096.0], dtype="float64")
    out = pd_to_u64(exact)
    assert out[0] == 1 and out[1] == 0 and out[2] == 4096
    with pytest.raises(TypeError, match="fractional"):
        pd_to_u64(pd.Series([1.5, 2.0], dtype="float64"))
    with pytest.raises(TypeError, match="2\\^53"):
        pd_to_u64(pd.Series([float(1 << 60)], dtype="float64"))
