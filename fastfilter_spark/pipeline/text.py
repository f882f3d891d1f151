"""Text-analysis operators for training-data pipelines.

Everything that can be expressed as Catalyst expressions is (token
counting, quality features, shingle fingerprints — all JVM-side,
whole-stage-codegen'd, no Python). Language ID is the one heuristic
that needs per-batch logic and runs as an Arrow-vectorized pandas UDF
over pandas string ops (no per-row Python loops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# token counting / quality features — pure Catalyst expressions
# ---------------------------------------------------------------------------

_WS = r"\s+"
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col) -> Column:
    """Whitespace tokens (array<string>), empty-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), _WS), lambda t: t != F.lit(""))


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col) -> Column:
    """Count of BPE-ish pre-tokens via regexp extraction."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_RE), 0))


def char_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def punct_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))


def digit_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))) \
        / F.greatest(F.length(c), F.lit(1))


def stopword_count(col, stopwords=("the", "a", "of", "and", "to", "in",
                                   "is", "it", "that", "for")) -> Column:
    """Count of (lowercased) stopword tokens — JVM-side via array ops."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


# PII redaction — patterns deliberately restricted to the regex subset
# Java (Spark) and RE2 (DuckDB/Go tooling) match IDENTICALLY: character
# classes, bounded/greedy quantifiers, non-capturing groups with
# first-character-disjoint alternatives (no ambiguity between the
# leftmost-first vs leftmost-longest engines), \b — no backreferences,
# no lookaround. That keeps the operator exactly cross-engine-
# verifiable (the driver oracle) and portable to scan-side pushdown
# later. Order matters and is applied sequentially: emails first (their
# digit runs must not be half-eaten by the phone patterns), then IPs
# (dotted digit runs), then phones.
#
# The phone patterns require phone STRUCTURE — a leading +country code,
# or a (NANP) 3-3-4 separated grouping — rather than "any long digit
# run": a bare [0-9 ()-]{8,} class destroyed every date, timestamp,
# numeric ID and decimal expansion in the corpus and merged adjacent
# unrelated numbers into one match (a scrub that corrupts the data it
# protects). Known non-match: single-run internationals like
# "+33 612345678" (one group) — widening to them re-admits "+1 2024".
#
# IPv6: the full 8-group form plus the common one-`::` compressions
# with at least one group on each side (fe80::1, 2001:db8::8a2e:1).
# Leading/trailing `::` (::1, fe80::) are a documented non-match —
# admitting them would also match `a::b`-shaped source-code tokens in
# a code corpus far more often than real loopback literals. Both
# patterns are alternation-free, so the leftmost-first (Java) and
# RE2 engines match identically.
#
# SSN is the 3-2-4 dashed shape — disjoint from NANP's 3-3-4, so
# ordering between them cannot half-eat either.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+",
     "<EMAIL>"),
    ("ip6", r"\b[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){7}\b", "<IP6>"),
    ("ip6c",
     r"\b(?:[0-9A-Fa-f]{1,4}:)+:(?:[0-9A-Fa-f]{1,4}:)*[0-9A-Fa-f]{1,4}\b",
     "<IP6>"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone_intl", r"\+[0-9]{1,3}(?:[ \-()]{1,2}[0-9]{1,4}){2,5}",
     "<PHONE>"),
    ("phone_nanp",
     r"(?:\([0-9]{3}\)[ \-]?[0-9]{3}|\b[0-9]{3}[ \-][0-9]{3})[ \-][0-9]{4}\b",
     "<PHONE>"),
)

# Credit cards are NOT a pure regex pattern: a 13-19 digit run (or the
# 4-4-4-4 grouped form) is only redacted when it passes the Luhn
# checksum — without the check the scrub destroys order ids, EAN/serial
# numbers and timestamps-as-integers wholesale (1 in 10 of THOSE still
# pass Luhn by chance; acceptable, the alternative is leaking real
# PANs). The step runs after `ssn` and before the phone patterns
# (NANP's 3-3-4 would half-eat a grouped card). Amex's 4-6-5 grouping
# is a documented non-match; the bare-run alternative still catches
# ungrouped Amex numbers (15 digits).
CC_PATTERN = r"\b(?:[0-9]{4}[ -]){3}[0-9]{4}\b|\b[0-9]{13,19}\b"
CC_TOKEN = "<CC>"
CC_AFTER = "ssn"


def _luhn_ok(m: Column) -> Column:
    """Luhn checksum entirely in Catalyst: strip separators, fold the
    doubled-every-second-digit-from-the-right sum over a sequence —
    IEEE-free integer arithmetic, so DuckDB reproduces it exactly."""
    ds = F.regexp_replace(m, r"[ -]", "")
    n = F.length(ds)

    def d(i):
        return F.ascii(F.substr(ds, i, F.lit(1))) - F.lit(48)

    s = F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0),
        lambda acc, i: acc + F.when(
            (n - i) % 2 == 1,
            d(i) * 2 - F.when(d(i) > 4, 9).otherwise(0)).otherwise(d(i)))
    return s % 10 == 0


def _redact_cc(cur: Column) -> tuple:
    """(n_cc count Column, redacted text Column): extract candidates,
    keep the Luhn-valid ones, literal-replace each via an aggregate
    fold (regexp_replace can't express 'replace only checksum-valid
    matches'). Known edge: a valid match that also occurs as a
    substring of a longer digit run elsewhere in the same document is
    replaced there too (literal replace has no \\b)."""
    valid = F.filter(F.regexp_extract_all(cur, F.lit(CC_PATTERN), 0),
                     _luhn_ok)
    red = F.aggregate(valid, cur,
                      lambda acc, m: F.replace(acc, m, F.lit(CC_TOKEN)))
    return F.size(valid), red


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Redact emails / IPv6s / IPv4s / SSNs / Luhn-valid credit cards /
    phone numbers with typed placeholder tokens — the standard scrub
    before training text leaves the pipeline. Pure Catalyst (regexp +
    aggregate-fold chain, whole-stage-codegen'd, no Python); adds
    per-pattern match counts (``n_email/n_ip6/n_ip6c/n_ip/n_ssn/n_cc/
    n_phone_intl/n_phone_nanp``, counted on the progressively-redacted
    text, so an IP inside an already-redacted email is not
    double-counted) and ``out_col`` with the scrubbed text. Every
    pattern stays inside the Java∩RE2 regex subset, so the DuckDB
    oracle reproduces the redacted text byte-identically.
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append((f"n_{name}",
                       F.size(F.regexp_extract_all(cur, F.lit(pat), 0))))
        cur = F.regexp_replace(cur, pat, token)
        if name == CC_AFTER:
            n_cc, cur = _redact_cc(cur)
            counts.append(("n_cc", n_cc))
    for cname, expr in counts:
        df = df.withColumn(cname, expr)
    return df.withColumn(out_col, cur)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard quality-scoring feature set, all JVM-side."""
    return (df
            .withColumn("n_chars_q", char_count(text_col))
            .withColumn("n_tokens", token_count(text_col))
            .withColumn("n_bpe_tokens", bpe_token_count(text_col))
            .withColumn("n_punct", punct_count(text_col))
            .withColumn("n_stopwords", stopword_count(text_col))
            .withColumn("mean_token_len",
                        F.col("n_chars_q") / F.greatest(F.col("n_tokens"), F.lit(1)))
            .withColumn("quality_score",
                        F.least(F.col("n_stopwords") / F.greatest(F.col("n_tokens"), F.lit(1)) * 5.0, F.lit(1.0))
                        * F.when((F.col("n_tokens") >= 5) & (F.col("mean_token_len").between(2.0, 12.0)), 1.0).otherwise(0.3)))


# ---------------------------------------------------------------------------
# document fingerprinting — winnowing-lite over word shingles, JVM-side
# ---------------------------------------------------------------------------

def shingles(col, k: int = 5) -> Column:
    """array<long>: xxhash64 of each k-word shingle (rolling window).

    The token array is let-bound through a single-element ``transform``
    so the tokenizing split runs ONCE per row: referencing
    ``tokens(col)`` directly inside the window lambda makes Catalyst
    re-evaluate the full split per shingle — O(words²) per document
    (measured 6× slower end-to-end on the sf0.1 corpus; the dominant
    cost of minhash_dedup).

    Empty and NULL documents yield an EMPTY array — without the size
    guard the clamped window emitted one phantom xxhash64('') shingle,
    which decontamination then treated as an n-gram shared by every
    empty doc (one empty benchmark row contaminated all empty training
    docs), and doc_fingerprint gave empty docs a common non-NULL
    fingerprint."""
    def _windows(tk):
        idx = F.when(
            F.size(tk) >= 1,
            F.sequence(F.lit(1),
                       F.greatest(F.size(tk) - (k - 1), F.lit(1)))) \
            .otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tk, i, k))))
    return F.transform(F.array(tokens(col)), _windows)[0]


def doc_fingerprint(col, k: int = 5) -> Column:
    """64-bit doc fingerprint = min shingle hash (winnowing-lite; equal
    for exact dups, stable under trailing whitespace)."""
    return F.array_min(shingles(col, k))


# ---------------------------------------------------------------------------
# language identification — n-gram/stopword heuristic, Arrow-vectorized
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " is ", " to "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "es": [" el ", " la ", " que ", " los ", " y "],
    "fr": [" le ", " la ", " les ", " et ", " est "],
}


@F.pandas_udf(T.StringType())
def lang_id(text: pd.Series) -> pd.Series:
    """Heuristic language ID: CJK codepoint share, else stopword votes.

    Vectorized via pandas .str ops (C-level), no per-row Python.

    Deliberately one .str.count pass PER MARKER (~20 passes), not one
    alternation regex per language: non-overlapping counting makes the
    alternation semantically different at shared boundaries (" the the "
    counts 1 marker per-marker but 2 with a lookahead alternation, and
    a consuming alternation eats the space the next marker needs), so
    collapsing the passes would silently change scores and break the
    frozen cross-engine oracle. The passes are C-level over the batch;
    measured cost is minor (VERDICT r4 #4 adjudicated low priority).
    """
    t = (" " + text.fillna("").str.lower() + " ")
    # CJK detection first
    cjk = t.str.count(r"[一-鿿]")
    total = t.str.len().clip(lower=1)
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        s = sum(t.str.count(m.replace(" ", r"\s")) for m in markers)
        scores[lang] = s
    score_df = pd.DataFrame(scores)
    best = score_df.idxmax(axis=1)
    best[score_df.max(axis=1) == 0] = "unknown"
    best[(cjk / total) > 0.05] = "zh"
    return best


def with_text_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop enrichment: quality features + fingerprint + language."""
    return (quality_features(df, text_col)
            .withColumn("fingerprint", doc_fingerprint(text_col))
            .withColumn("lang_pred", lang_id(F.col(text_col))))


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    * ``dup_word_frac``  — 1 − distinct_tokens / total_tokens (pure
      per-row Catalyst expressions, no shuffle);
    * ``dup_line_frac`` / ``dup_line_char_frac`` — surplus occurrences
      of repeated lines (beyond each line's first) as a fraction of
      lines / of line characters (per-row array algebra, no shuffle);
    * ``top_bigram_frac`` — count of the most frequent word bigram /
      total bigrams, via explode → (doc, bigram) count → per-doc
      max/sum — the same two-level aggregation shape as TF-IDF; both
      shuffles key on the doc id so they stay balanced at corpus scale.

    All outputs are rational (int/int division) — bit-identical across
    engines. Repetitive documents (boilerplate, keyword stuffing,
    degenerate generations) score high on either signal; filter with
    e.g. ``dup_word_frac > 0.7 OR top_bigram_frac > 0.2``.
    """
    toks = tokens(text_col)

    # docs with <2 tokens have NO bigrams (an empty array, not a phantom
    # one-word "bigram" — that would score empty/one-word docs as
    # maximally repetitive); their top_bigram_frac coalesces to 0.0.
    # The token array is let-bound (single-element transform, same trick
    # as shingles()) so the split runs once per row, not once per bigram.
    def _bigrams(tk):
        return F.when(
            F.size(tk) >= 2,
            F.transform(F.sequence(F.lit(1), F.size(tk) - 1),
                        lambda i: F.concat_ws(" ", F.slice(tk, i, 2)))
        ).otherwise(F.array().cast("array<string>"))

    big = F.transform(F.array(toks), _bigrams)[0]
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"),
                     big.alias("bg"), F.split(c, r"\n").alias("ln"))
    # Gopher duplicate-line signals — per-row array algebra, NO extra
    # shuffle: a line repeated c times contributes its (c−1) surplus
    # occurrences (and their characters) to the dup fractions.
    line_chars = F.aggregate(F.col("ln"), F.lit(0).cast("long"),
                             lambda acc, l: acc + F.length(l))
    dist_chars = F.aggregate(F.array_distinct("ln"),
                             F.lit(0).cast("long"),
                             lambda acc, l: acc + F.length(l))
    per_doc = base.select(
        "id",
        F.size("t").alias("n_tokens"),
        F.when(F.size("t") > 0,
               F.lit(1.0) - F.size(F.array_distinct("t")) / F.size("t"))
        .otherwise(F.lit(0.0)).alias("dup_word_frac"),
        (F.lit(1.0) - F.size(F.array_distinct("ln")) / F.size("ln"))
        .alias("dup_line_frac"),
        F.when(line_chars > 0, (line_chars - dist_chars) / line_chars)
        .otherwise(F.lit(0.0)).alias("dup_line_char_frac"))
    bg_counts = (base.select("id", F.explode("bg").alias("b"))
                 .groupBy("id", "b").agg(F.count("*").alias("c")))
    bg_stats = (bg_counts.groupBy("id")
                .agg((F.max("c") / F.sum("c")).alias("top_bigram_frac")))
    return (per_doc.join(bg_stats, "id", "left")
            .withColumn("top_bigram_frac",
                        F.coalesce("top_bigram_frac", F.lit(0.0))))


# ---------------------------------------------------------------------------
# Gopher document-quality gate (Rae et al. 2021, Table A1) — pure Catalyst
# ---------------------------------------------------------------------------

# the published rule requires ≥2 of these to appear in the document
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_GOPHER_OUT_COLS = (
    "n_words", "mean_word_len", "symbol_word_ratio", "bullet_line_ratio",
    "ellipsis_line_ratio", "alpha_word_ratio", "stopword_hits",
    "r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_bullet_lines",
    "r_ellipsis_lines", "r_alpha_words", "r_stopwords", "gopher_keep",
)


def gopher_quality(df: DataFrame, text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_symbol_word_ratio: float = 0.1,
                   max_bullet_line_ratio: float = 0.9,
                   max_ellipsis_line_ratio: float = 0.3,
                   min_alpha_word_ratio: float = 0.8,
                   min_stopword_hits: int = 2) -> DataFrame:
    """The published Gopher quality-filter ruleset as ONE zero-shuffle
    Catalyst projection: per-document metrics, one boolean per rule,
    and the conjunction ``gopher_keep``.

    Rules (Rae et al. 2021 "Scaling Language Models" Table A1):
    word count in [50, 100k]; mean word length in [3, 10]; '#'/'…'
    symbols ≤0.1 per word; ≤90% of lines bullet-started; ≤30% of lines
    ellipsis-ended; ≥80% of words contain an alphabetic character; ≥2
    of 8 required English stopwords present.

    Every metric is an exact integer or one IEEE division of exact
    integers, and every regex sits in the Java∩RE2 subset, so a DuckDB
    oracle reproduces all columns bit-identically (the redact_pii
    discipline). The token/line arrays are materialized ONCE as real
    columns — each derived metric reads the array, not a re-split.
    """
    clash = set(_GOPHER_OUT_COLS) & set(df.columns)
    if clash:
        raise ValueError(f"gopher_quality output columns already exist: "
                         f"{sorted(clash)}")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    base = df.withColumn("__tk", tokens(text_col)) \
             .withColumn("__lines", F.split(c, r"\n"))

    tk, lines = F.col("__tk"), F.col("__lines")
    n_words = F.size(tk).cast("long")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("long")
    sum_word_chars = F.aggregate(
        tk, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    # '...' counted via non-overlapping left-to-right replacement —
    # identical semantics in Spark regexp_replace and DuckDB 'g' mode
    n_hash = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    n_ell = ((F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", "")))
             / F.lit(3)).cast("long") \
        + F.length(c) - F.length(F.regexp_replace(c, "…", ""))
    bullet_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike("^[-*•]")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
    alpha_words = F.size(F.filter(tk, lambda w: w.rlike("[A-Za-z]")))
    low = F.transform(tk, lambda t: F.lower(t))
    stopword_hits = sum(
        (F.array_contains(low, F.lit(s)).cast("int") for s in GOPHER_STOPWORDS),
        F.lit(0))

    nw_safe = F.greatest(n_words, F.lit(1))
    out = (base
           .withColumn("n_words", n_words)
           .withColumn("mean_word_len", sum_word_chars / nw_safe)
           .withColumn("symbol_word_ratio", (n_hash + n_ell) / nw_safe)
           .withColumn("bullet_line_ratio", bullet_lines / n_lines)
           .withColumn("ellipsis_line_ratio", ellipsis_lines / n_lines)
           .withColumn("alpha_word_ratio", alpha_words / nw_safe)
           .withColumn("stopword_hits", stopword_hits)
           .drop("__tk", "__lines"))
    out = (out
           .withColumn("r_word_count",
                       F.col("n_words").between(min_words, max_words))
           .withColumn("r_mean_word_len",
                       F.col("mean_word_len").between(min_mean_word_len,
                                                      max_mean_word_len))
           .withColumn("r_symbol_ratio",
                       F.col("symbol_word_ratio") <= max_symbol_word_ratio)
           .withColumn("r_bullet_lines",
                       F.col("bullet_line_ratio") <= max_bullet_line_ratio)
           .withColumn("r_ellipsis_lines",
                       F.col("ellipsis_line_ratio") <= max_ellipsis_line_ratio)
           .withColumn("r_alpha_words",
                       F.col("alpha_word_ratio") >= min_alpha_word_ratio)
           .withColumn("r_stopwords",
                       F.col("stopword_hits") >= min_stopword_hits))
    keep = F.lit(True)
    for r in ("r_word_count", "r_mean_word_len", "r_symbol_ratio",
              "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
              "r_stopwords"):
        keep = keep & F.col(r)
    return out.withColumn("gopher_keep", keep)


# ---------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020 §2.2) — pure Catalyst
# ---------------------------------------------------------------------------

_C4_POLICY_PHRASES = ("terms of use", "privacy policy", "cookie policy",
                      "uses cookies")

_C4_OUT_COLS = ("clean_text", "n_lines_total", "n_lines_kept",
                "n_sentences", "has_lorem_ipsum", "has_curly_brace",
                "has_policy_phrase", "c4_keep")


def c4_quality(df: DataFrame, text_col: str = "text",
               min_line_words: int = 3,
               min_sentences: int = 5) -> DataFrame:
    """The published C4 line/page cleaning rules as ONE zero-shuffle
    Catalyst projection (Raffel et al. 2020 "Exploring the Limits of
    Transfer Learning" §2.2): keep only lines that end in terminal
    punctuation (``. ! ? "``), contain ≥3 words, and don't mention
    "javascript"; drop whole pages containing "lorem ipsum", a curly
    brace, or a boilerplate policy phrase, or whose cleaned text has
    fewer than 5 sentences (terminal-punctuation count — the paper's
    sentence proxy). The upstream word-deny-list rule is deliberately
    omitted (corpus-policy dependent, not a fixed published list).

    Emits ``clean_text`` (kept lines rejoined) plus the per-page
    booleans and ``c4_keep``. Line word-counting reuses the exact
    ``tokens()`` semantics so the DuckDB oracle reproduces the full
    cleaned STRING byte-identically (the redact_pii discipline).
    """
    clash = set(_C4_OUT_COLS) & set(df.columns)
    if clash:
        raise ValueError(f"c4_quality output columns already exist: "
                         f"{sorted(clash)}")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    base = df.withColumn("__lines", F.split(c, r"\n"))
    lines = F.col("__lines")

    def _line_kept(l):
        words = F.filter(F.split(F.trim(l), _WS), lambda t: t != F.lit(""))
        return (F.trim(l).rlike('[.!?"]$')
                & (F.size(words) >= min_line_words)
                & ~F.lower(l).contains("javascript"))

    kept = F.filter(lines, _line_kept)
    low = F.lower(c)
    has_policy = F.lit(False)
    for ph in _C4_POLICY_PHRASES:
        has_policy = has_policy | low.contains(ph)

    out = (base
           .withColumn("clean_text", F.concat_ws("\n", kept))
           .withColumn("n_lines_total", F.size(lines).cast("long"))
           .withColumn("n_lines_kept", F.size(kept).cast("long"))
           .withColumn("has_lorem_ipsum", low.contains("lorem ipsum"))
           .withColumn("has_curly_brace", c.contains("{"))
           .withColumn("has_policy_phrase", has_policy)
           .drop("__lines"))
    out = out.withColumn(
        "n_sentences",
        (F.length("clean_text")
         - F.length(F.regexp_replace("clean_text", r"[.!?]", "")))
        .cast("long"))
    return out.withColumn(
        "c4_keep",
        ~F.col("has_lorem_ipsum") & ~F.col("has_curly_brace")
        & ~F.col("has_policy_phrase")
        & (F.col("n_sentences") >= min_sentences))
