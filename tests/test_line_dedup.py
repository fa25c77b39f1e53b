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


def _line_dedup_via_window(docs, sep="\n", min_words=2):
    """The pre-r6 formulation: (line)-partitioned row_number window.
    Kept here ONLY as the equivalence baseline — a corpus-hot line sorts
    all its occurrences in one window task, which is why production
    switched to the combinable min(struct) aggregation."""
    from pyspark.sql import Window

    lines = docs.select(
        F.col("doc_id"), F.posexplode(F.split(F.col("text"), sep)).alias("pos", "line")
    ).withColumn("eligible", F.size(F.split(F.trim(F.col("line")), r"\s+")) >= min_words)
    w = Window.partitionBy("line").orderBy(F.col("doc_id").asc(), F.col("pos").asc())
    ranked = lines.where(F.col("eligible")).withColumn("keep", F.row_number().over(w) == 1)
    exempt = lines.where(~F.col("eligible")).withColumn("keep", F.lit(True))
    kept = ranked.unionByName(exempt).drop("eligible")
    return kept.groupBy("doc_id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.when(F.col("keep"), F.struct("pos", "line")))),
                lambda x: x["line"],
            ),
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    )


def test_equivalent_to_window_form_on_generated_corpus(spark):
    # deterministic corpus with hot lines (shared banners), in-doc repeats,
    # short/blank exempt lines, and all-lines-lose documents
    banners = ["shared banner line", "footer boilerplate text", "x"]
    rows = []
    for i in range(60):
        lines = [
            banners[i % 3],
            f"unique content {i} alpha",
            "",
            banners[(i + 1) % 3],
            f"unique content {i} beta" if i % 4 else banners[0],
            "tok",
        ]
        rows.append((i, "\n".join(lines)))
    rows.append((60, "shared banner line"))  # loses its only line
    docs = _docs(spark, rows)
    new = {r["doc_id"]: r.asDict() for r in line_dedup(docs).collect()}
    old = {r["doc_id"]: r.asDict() for r in _line_dedup_via_window(docs).collect()}
    assert new == old


def test_plan_has_no_window_and_partial_min(spark):
    # the scale contract: first-occurrence selection must be a partially
    # aggregated min, never a (line)-partitioned window sort
    df = line_dedup(_docs(spark, [(1, "a b\nc d"), (2, "a b\ne f")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan or "partial min" in plan.lower()
