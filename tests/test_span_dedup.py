"""Span-level dedup (pipeline/dedup.py dup_span_stats /
remove_dup_spans). Load-bearing claims:

* first-occurrence-kept: the globally-first copy of a repeated gram
  (min (id, pos)) is never counted or removed.
* interval-union coverage: overlapping duplicated grams never
  double-count a token.
* remove_dup_spans: len(split(clean_text)) == n_tokens - dup_tokens
  exactly; a full duplicate document empties; unique docs survive
  verbatim (modulo whitespace normalization).
* bit-exact vs a brute-force Python reference on a seeded random
  corpus with planted span copying.
"""

from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.pipeline import dup_span_stats, remove_dup_spans


def _ref_stats(docs, g, min_count):
    toks = {i: t.split() for i, t in docs if t.split()}
    occ = defaultdict(list)
    for i in sorted(toks):
        tk = toks[i]
        for p in range(1, max(len(tk) - g + 1, 1) + 1):
            occ[" ".join(tk[p - 1:p - 1 + g])].append((i, p))
    dup = defaultdict(list)
    for lst in occ.values():
        if len(lst) >= min_count:
            first = min(lst)
            for o in lst:
                if o != first:
                    dup[o[0]].append(o[1])
    out = {}
    for i, tk in toks.items():
        n = len(tk)
        cov = prev = 0
        ps = sorted(dup.get(i, []))
        for p in ps:
            e = min(p + g - 1, n)
            cov += max(0, e - max(p, prev + 1) + 1)
            prev = max(prev, e)
        out[i] = (n, len(ps), cov)
    return out


@pytest.fixture(scope="module")
def planted(spark):
    """A=unique, B=embeds tokens 11..30 of A, C=exact copy of A,
    D=short doc, E=copy of D."""
    words_a = [f"a{i}" for i in range(60)]
    a = " ".join(words_a)
    b = " ".join([f"b{i}" for i in range(10)] + words_a[10:30]
                 + [f"c{i}" for i in range(10)])
    d = "tiny doc"
    rows = [(1, a), (2, b), (3, a), (4, d), (5, d)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_spans(spark, planted):
    got = {r.id: r for r in
           dup_span_stats(planted, "text", "doc_id", g=8).collect()}
    # doc 1 is the first occurrence of everything it contains
    assert got[1].dup_tokens == 0 and got[1].n_dup_grams == 0
    # doc 3 is a full copy: every gram duplicated, full coverage
    assert got[3].dup_tokens == 60 and got[3].dup_frac == 1.0
    assert got[3].n_dup_grams == 60 - 8 + 1
    # doc 2 embeds a 20-token span of doc 1: its duplicated grams are
    # exactly the 20-8+1=13 windows inside the span, covering 20 tokens
    assert got[2].n_dup_grams == 13 and got[2].dup_tokens == 20
    # short-doc degradation to exact dedup: doc 5 duplicates doc 4
    assert got[4].dup_tokens == 0
    assert got[5].dup_tokens == 2 and got[5].dup_frac == 1.0


def test_remove_dup_spans_planted(spark, planted):
    got = {r.id: r for r in
           remove_dup_spans(planted, "text", "doc_id", g=8).collect()}
    texts = {r.doc_id: r.text for r in planted.collect()}
    assert got[1].clean_text == texts[1]
    assert got[3].clean_text == ""
    assert got[5].clean_text == ""
    # token-count invariant holds on every row
    for r in got.values():
        n_clean = len(r.clean_text.split()) if r.clean_text else 0
        assert n_clean == r.n_tokens - r.dup_tokens
    # doc 2 keeps its unique prefix/suffix, loses the embedded span
    assert got[2].clean_text == " ".join(
        [f"b{i}" for i in range(10)] + [f"c{i}" for i in range(10)])


def test_matches_bruteforce_random_corpus(spark):
    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    for i in range(40):
        n = int(rng.integers(3, 60))
        docs.append([vocab[j] for j in rng.integers(0, 50, n)])
    # plant copying: doc i copies a slice of doc i-3
    for i in range(3, 40, 4):
        src = docs[i - 3]
        L = min(len(src), int(rng.integers(5, 25)))
        s = int(rng.integers(0, len(src) - L + 1))
        docs[i] = docs[i][:5] + src[s:s + L] + docs[i][5:]
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for g, mc in ((5, 2), (8, 2), (5, 3)):
        ref = _ref_stats(rows, g, mc)
        got = {r.id: (r.n_tokens, r.n_dup_grams, r.dup_tokens)
               for r in dup_span_stats(df, "text", "doc_id",
                                       g=g, min_count=mc).collect()}
        assert got == ref, (g, mc)


def test_remove_invariant_random(spark):
    rng = np.random.default_rng(7)
    rows = [(i, " ".join(f"w{j}" for j in rng.integers(0, 20,
                                                       rng.integers(1, 40))))
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_dup_spans(df, "text", "doc_id", g=4).collect()
    assert len(out) == 30
    for r in out:
        n_clean = len(r.clean_text.split()) if r.clean_text else 0
        assert n_clean == r.n_tokens - r.dup_tokens


def test_merged_islands_bound_per_doc_work(spark):
    """A fully-duplicated doc collapses to ONE disjoint island (the
    guarantee that keeps remove_dup_spans O(n_tokens·n_islands), not
    O(n_tokens·n_occurrences)); two separated copied regions stay two."""
    from fastfilter_spark.pipeline.dedup import (_dup_occurrences,
                                                 _merged_spans,
                                                 _positioned_grams)
    words = [f"a{i}" for i in range(200)]
    full = " ".join(words)
    # doc 3: two disjoint copied regions (tokens 0..49 and 150..199 of
    # doc 1) separated by 100 unique tokens
    split = " ".join(words[:50] + [f"u{i}" for i in range(100)]
                     + words[150:])
    df = spark.createDataFrame(
        [(1, full), (2, full), (3, split)], "doc_id long, text string")
    _, grams = _positioned_grams(df, "text", "doc_id", 8)
    merged = _merged_spans(_dup_occurrences(grams, 2), 8)
    per_doc = {r.id: r.n for r in
               merged.groupBy("id").agg(F.count("*").alias("n")).collect()}
    assert per_doc[2] == 1          # 193 occurrences -> 1 island
    assert per_doc[3] == 2          # two separated regions
    assert 1 not in per_doc         # first copy of everything


def test_empty_and_whitespace_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real text here okay")],
        "doc_id long, text string")
    out = dup_span_stats(df, "text", "doc_id", g=2).collect()
    assert sorted(r.id for r in out) == [3]
