"""Inter-document line dedup (`text.line_dedup`) — C4-style boilerplate
removal: globally-first occurrence wins, short lines exempt, texts
rebuilt in original order."""

from pyspark.sql import functions as F

from debezium_connector_yugabytedb_1_spark.operators.text import line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_first_occurrence_wins_across_documents(spark):
    rows = [
        (1, "unique alpha line\nshared boilerplate banner\nunique beta line"),
        (2, "shared boilerplate banner\nanother unique line"),
        (3, "third doc text\nshared boilerplate banner"),
    ]
    out = _out(line_dedup(_docs(spark, rows)))
    assert out[1]["text_dedup"].splitlines() == [
        "unique alpha line", "shared boilerplate banner", "unique beta line"
    ]
    assert out[2]["text_dedup"] == "another unique line"
    assert out[3]["text_dedup"] == "third doc text"
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1


def test_within_document_repeat_kept_once(spark):
    out = _out(line_dedup(_docs(spark, [(7, "same long line\nmid part here\nsame long line")])))
    assert out[7]["text_dedup"].splitlines() == ["same long line", "mid part here"]


def test_short_and_blank_lines_are_exempt(spark):
    rows = [
        (1, "word\n\nreal content line"),
        (2, "word\n\nother content line"),
    ]
    out = _out(line_dedup(_docs(spark, rows)))
    # 1-word and blank lines repeat across docs but are structure, not
    # boilerplate — both docs keep them
    assert out[1]["text_dedup"].splitlines() == ["word", "", "real content line"]
    assert out[2]["text_dedup"].splitlines() == ["word", "", "other content line"]


def test_document_losing_every_line_becomes_empty(spark):
    rows = [(1, "only shared line"), (2, "only shared line")]
    out = _out(line_dedup(_docs(spark, rows)))
    assert out[1]["text_dedup"] == "only shared line"
    assert out[2]["text_dedup"] == "" and out[2]["n_kept"] == 0


def test_plan_stays_jvm(spark):
    df = line_dedup(_docs(spark, [(1, "a b\nc d")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
