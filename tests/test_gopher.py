"""Gopher quality-rule gate (pipeline/text.py gopher_quality): each
published rule flips on its planted fixture doc, metrics match a plain
Python reference, and the plan is a zero-shuffle projection."""

import numpy as np
import pytest

from fastfilter_spark.pipeline import gopher_quality

GOOD = ("the quick brown fox jumps over the lazy dog and then runs back "
        "to be with its friends that have come along with plenty of time "
        "and energy left over for one more round of chasing things today "
        "because the weather is fine and everyone is happy with that ") * 2

DOCS = [
    # (doc_id, text, expected_failing_rule or None)
    (0, GOOD, None),
    (1, "too short", "r_word_count"),
    (2, " ".join(["a"] * 80) + " the be", "r_mean_word_len"),  # mean len < 3
    (3, GOOD + " " + " ".join(["#"] * 15), "r_symbol_ratio"),
    (4, "\n".join(["- " + w for w in GOOD.split()]), "r_bullet_lines"),
    (5, "\n".join([w + "..." for w in GOOD.split()]), "r_ellipsis_lines"),
    (6, " ".join(["1234"] * 60) + " the be with that have",
     "r_alpha_words"),
    (7, " ".join(["wombat"] * 60), "r_stopwords"),
]


@pytest.fixture(scope="module")
def gq(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict()
            for r in gopher_quality(df).collect()}
    return rows


def test_good_doc_kept(gq):
    assert gq[0]["gopher_keep"] is True


@pytest.mark.parametrize("doc_id,rule",
                         [(i, r) for i, _, r in DOCS if r])
def test_each_rule_flips(gq, doc_id, rule):
    assert gq[doc_id][rule] is False, (doc_id, rule, gq[doc_id])
    assert gq[doc_id]["gopher_keep"] is False


def test_metrics_match_python_reference(gq):
    import re
    for doc_id, text, _ in DOCS:
        toks = [t for t in re.split(r"\s+", text.strip()) if t]
        lines = text.split("\n")
        nw, nl = max(len(toks), 1), max(len(lines), 1)
        row = gq[doc_id]
        assert row["n_words"] == len(toks)
        assert row["mean_word_len"] == pytest.approx(
            sum(len(t) for t in toks) / nw)
        n_sym = text.count("#") + text.count("…") + (
            len(text) - len(text.replace("...", ""))) // 3
        assert row["symbol_word_ratio"] == pytest.approx(n_sym / nw)
        assert row["bullet_line_ratio"] == pytest.approx(
            sum(1 for l in lines if re.match(r"^[-*•]", l.strip())) / nl)
        assert row["ellipsis_line_ratio"] == pytest.approx(
            sum(1 for l in lines if re.search(r"(\.\.\.|…)$", l)) / nl)
        assert row["alpha_word_ratio"] == pytest.approx(
            sum(1 for t in toks if re.search("[A-Za-z]", t)) / nw)


def test_randomized_against_python_reference(spark):
    """200 random docs over a small vocab incl. rule-triggering glyphs."""
    import re
    rng = np.random.default_rng(7)
    vocab = ["the", "be", "to", "wombat", "a", "#", "...", "12",
             "-", "alpha", "bravo…", "xylophone"]
    docs = []
    for i in range(200):
        n = int(rng.integers(0, 120))
        words = rng.choice(vocab, size=n)
        sep = "\n" if rng.random() < 0.3 else " "
        docs.append((i, sep.join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}
    for i, text in docs:
        toks = [t for t in re.split(r"\s+", text.strip()) if t]
        nw = max(len(toks), 1)
        assert rows[i]["n_words"] == len(toks)
        assert rows[i]["alpha_word_ratio"] == pytest.approx(
            sum(1 for t in toks if re.search("[A-Za-z]", t)) / nw)
        hits = sum(1 for s in ("the", "be", "to", "of", "and", "that",
                               "have", "with")
                   if s in [t.lower() for t in toks])
        assert rows[i]["stopword_hits"] == hits


def test_collision_guard(spark):
    df = spark.createDataFrame([(1, "x", 3)],
                               "doc_id long, text string, n_words int")
    with pytest.raises(ValueError, match="already exist"):
        gopher_quality(df)


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "hello world")],
                               "doc_id long, text string")
    plan = gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---- C4 cleaning rules ------------------------------------------------------

SENT = "This line has plenty of words and ends properly."
C4_DOCS = [
    # (doc_id, text, expect_keep, expect_kept_lines)
    (0, "\n".join([SENT] * 6), True, 6),
    (1, "\n".join([SENT] * 6) + "\nlorem ipsum dolor sit amet.", False, 7),
    (2, "\n".join([SENT] * 6) + "\nfunction f() { return 1; }", False, 6),
    (3, "\n".join([SENT] * 6) + "\nRead our Privacy Policy here.", False, 7),
    (4, SENT + "\n" + SENT, True and False, 2),       # only 2 sentences < 5
    (5, "no terminal punctuation here\n" + "\n".join([SENT] * 5), True, 5),
    (6, "Enable javascript to view this page.\n" + "\n".join([SENT] * 5),
     True, 5),
    (7, "Too short.\n" + "\n".join([SENT] * 5), True, 5),  # <3 words dropped
]


@pytest.fixture(scope="module")
def c4(spark):
    from fastfilter_spark.pipeline import c4_quality
    df = spark.createDataFrame([(i, t) for i, t, _, _ in C4_DOCS],
                               "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_quality(df).collect()}


@pytest.mark.parametrize("doc_id,keep,kept_lines",
                         [(i, k, n) for i, _, k, n in C4_DOCS])
def test_c4_page_rules(c4, doc_id, keep, kept_lines):
    row = c4[doc_id]
    assert row["c4_keep"] is keep, row
    assert row["n_lines_kept"] == kept_lines, row


def test_c4_line_filters_rebuild_text(c4):
    # dropped lines are gone from clean_text; kept lines intact
    assert "javascript" not in c4[6]["clean_text"].lower()
    assert "Too short." not in c4[7]["clean_text"]
    assert "no terminal punctuation" not in c4[5]["clean_text"]
    assert c4[0]["clean_text"] == "\n".join([SENT] * 6)


def test_c4_zero_shuffle_plan(spark):
    from fastfilter_spark.pipeline import c4_quality
    df = spark.createDataFrame([(1, "hello world.")],
                               "doc_id long, text string")
    plan = c4_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_c4_collision_guard(spark):
    from fastfilter_spark.pipeline import c4_quality
    df = spark.createDataFrame([(1, "x", "y")],
                               "doc_id long, text string, clean_text string")
    with pytest.raises(ValueError, match="already exist"):
        c4_quality(df)
