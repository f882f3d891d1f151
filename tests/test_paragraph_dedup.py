"""paragraph_dedup (pipeline/dedup.py): CCNet-style corpus-wide
keep-first paragraph dedup with document reassembly."""
import pytest


def _run(spark, rows, **kw):
    from fastfilter_spark.pipeline import paragraph_dedup
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = paragraph_dedup(df, "text", "doc_id", **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_keep_first_across_docs(spark):
    got = _run(spark, [(1, "A\n\nB\n\nC"), (2, "B\n\nD"), (3, "A\n\nB")])
    assert got[1]["clean_text"] == "A\n\nB\n\nC"
    assert (got[1]["n_paras"], got[1]["n_kept"], got[1]["n_dropped"]) \
        == (3, 3, 0)
    assert got[2]["clean_text"] == "D"
    assert got[2]["n_dropped"] == 1
    assert got[3]["clean_text"] == ""
    assert (got[3]["n_paras"], got[3]["n_kept"], got[3]["n_dropped"]) \
        == (2, 0, 2)


def test_keep_first_within_doc(spark):
    got = _run(spark, [(1, "P\n\nQ\n\nP")])
    assert got[1]["clean_text"] == "P\n\nQ"
    assert got[1]["n_dropped"] == 1


def test_short_paragraphs_exempt(spark):
    # empty paragraphs (double separators) are kept in BOTH docs —
    # only content paragraphs dedup
    got = _run(spark, [(1, "X\n\n\n\nY"), (2, "Z\n\n\n\nY")],
               min_chars=1)
    assert got[1]["clean_text"] == "X\n\n\n\nY"
    assert got[2]["clean_text"] == "Z\n\n"      # '' kept, Y dropped
    assert got[2]["n_dropped"] == 1


def test_regex_metachar_separator(spark):
    got = _run(spark, [(1, "a||b||a"), (2, "b||c")], sep="||")
    assert got[1]["clean_text"] == "a||b"
    assert got[2]["clean_text"] == "c"


def test_reserved_name_guard(spark):
    from fastfilter_spark.pipeline import paragraph_dedup
    df = spark.createDataFrame([(1, "t", 0)],
                               ["doc_id", "text", "n_paras"])
    with pytest.raises(ValueError):
        paragraph_dedup(df, "text", "doc_id")


def test_plan_no_cartesian_and_partial_min(spark):
    from fastfilter_spark.pipeline import paragraph_dedup
    df = spark.createDataFrame([(1, "A\n\nB")], ["doc_id", "text"])
    plan = paragraph_dedup(df, "text", "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_randomized_python_reference(spark):
    # 3 seeded corpora vs a pure-Python keep-first reference
    import random
    from fastfilter_spark.pipeline import paragraph_dedup
    pool = [f"para{i}" for i in range(12)]
    for seed in (0, 1, 2):
        rng = random.Random(seed)
        texts = {i: "\n\n".join(rng.choice(pool)
                                for _ in range(rng.randint(1, 6)))
                 for i in range(40)}
        seen, ref = set(), {}
        for i in sorted(texts):
            kept = []
            for p in texts[i].split("\n\n"):
                if len(p) < 1:
                    kept.append(p)
                elif p not in seen:
                    seen.add(p)
                    kept.append(p)
            ref[i] = "\n\n".join(kept)
        df = spark.createDataFrame(list(texts.items()),
                                   ["doc_id", "text"])
        got = {r["doc_id"]: r["clean_text"]
               for r in paragraph_dedup(df, "text", "doc_id").collect()}
        assert got == ref
