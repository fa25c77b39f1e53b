"""Corpus-curation operators (operators/mixing.py): benchmark
decontamination, deterministic stratified sampling, token-budget packing."""

import pyspark.sql.functions as F
import pytest

from debezium_connector_yugabytedb_1_spark.operators.mixing import (
    _rate_to_hex,
    decontaminate,
    pack_sequences,
    stratified_sample,
)


def _docs(spark, rows, cols="doc_id long, text string, lang string"):
    return spark.createDataFrame(rows, cols)


# ---------------------------------------------------------------- decontaminate
def test_decontaminate_overlap_and_coverage(spark):
    docs = _docs(spark, [
        (1, "alpha beta gamma delta epsilon", "en"),      # 0 overlap
        (2, "the quick brown fox jumps high", "en"),      # partial
        (3, "benchmark text exactly here now", "en"),     # full overlap
    ])
    bench = _docs(spark, [
        (100, "quick brown fox jumps", "en"),
        (101, "benchmark text exactly here now", "en"),
    ])
    out = {r["doc_id"]: r.asDict() for r in decontaminate(docs, bench, threshold=0.5).collect()}
    assert set(out) == {1, 2, 3}  # every doc reported, hits or not
    assert out[1]["n_overlap"] == 0 and not out[1]["contaminated"]
    # doc 2: shingles {the quick brown, quick brown fox, brown fox jumps,
    # fox jumps high}; bench has {quick brown fox, brown fox jumps} → 2/4
    assert out[2]["n_overlap"] == 2 and out[2]["n_shingles"] == 4
    assert out[2]["contaminated"]  # 0.5 >= threshold
    assert out[3]["overlap_frac"] == 1.0 and out[3]["contaminated"]


def test_decontaminate_benchmark_is_broadcast(spark):
    docs = _docs(spark, [(1, "a b c d", "en")])
    bench = _docs(spark, [(2, "a b c", "en")])
    plan = decontaminate(docs, bench)._jdf.queryExecution().executedPlan().toString()
    # the corpus must never shuffle on the shingle key
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------- sampling
def test_rate_to_hex_bounds():
    assert _rate_to_hex(0.0) == "0000"
    assert _rate_to_hex(0.5) == "8000"
    assert _rate_to_hex(1.0) == "g000"  # must sort ABOVE every hex prefix
    assert _rate_to_hex(1.0) > "ffff"
    with pytest.raises(ValueError):
        _rate_to_hex(1.5)


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs(spark, [(i, f"t {i}", ["en", "zh", "xx"][i % 3]) for i in range(600)])
    out = stratified_sample(docs, rates={"en": 0.5, "zh": 1.0}, default_rate=0.0)
    rows = [(r["doc_id"], r["lang"]) for r in out.collect()]
    langs = {l for _, l in rows}
    assert "xx" not in langs            # default_rate=0 drops unknown strata
    n_zh = sum(1 for _, l in rows if l == "zh")
    assert n_zh == 200                  # rate 1.0 keeps the whole stratum
    n_en = sum(1 for _, l in rows if l == "en")
    assert 60 <= n_en <= 140            # ~rate 0.5 of 200, md5-uniform
    # pure function of (seed, key): identical across plans and seeds differ
    again = [(r["doc_id"], r["lang"]) for r in stratified_sample(
        docs, rates={"en": 0.5, "zh": 1.0}, default_rate=0.0).collect()]
    assert sorted(rows) == sorted(again)
    other_seed = [(r["doc_id"], r["lang"]) for r in stratified_sample(
        docs, rates={"en": 0.5, "zh": 1.0}, default_rate=0.0, seed=8).collect()]
    assert sorted(rows) != sorted(other_seed)


def test_stratified_sample_is_pure_filter(spark):
    docs = _docs(spark, [(1, "t", "en")])
    plan = (
        stratified_sample(docs, rates={"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # zero shuffles: filter projection only


# ---------------------------------------------------------------- packing
def test_pack_sequences_chunk_assignment(spark):
    # en: token counts 4, 4, 4 with budget 6 → offsets 0, 4, 8 → chunks 0, 0, 1
    docs = _docs(spark, [
        (1, "a b c d", "en"),
        (2, "e f g h", "en"),
        (3, "i j k l", "en"),
        (4, "m n", "zh"),          # separate stratum restarts at offset 0
    ])
    out = {r["doc_id"]: r.asDict() for r in pack_sequences(docs, budget=6).collect()}
    assert [out[i]["chunk_id"] for i in (1, 2, 3)] == [0, 0, 1]
    assert [out[i]["cum_tokens"] for i in (1, 2, 3)] == [4, 8, 12]
    assert out[4]["chunk_id"] == 0
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs, budget=0)


# ------------------------------------------------- survivor policy / repetition
def test_elect_survivors_best_score_wins(spark):
    from debezium_connector_yugabytedb_1_spark.operators.dedup import elect_survivors

    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)], "doc_id long, group_id long"
    )
    scores = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5), (9, 5)], "doc_id long, score long"
    )
    out = {r["doc_id"]: r.asDict() for r in elect_survivors(groups, scores).collect()}
    assert [out[i]["is_survivor"] for i in (1, 2, 3)] == [False, True, False]  # tie -> min id
    assert out[7]["is_survivor"] and not out[9]["is_survivor"]
    # exactly one survivor per group
    assert sum(v["is_survivor"] for v in out.values()) == 2


def test_repetition_features_signals(spark):
    from debezium_connector_yugabytedb_1_spark.operators.text import repetition_features

    docs = _docs(spark, [
        (1, "same line\nsame line\nsame line\nother", "en"),   # 4 lines, 2 distinct
        (2, "spam spam spam spam spam", "en"),                  # one bigram repeated
        (3, "all fresh words here now", "en"),                  # no repetition
    ])
    out = {r["doc_id"]: r.asDict() for r in repetition_features(docs).collect()}
    assert out[1]["n_lines"] == 4 and out[1]["dup_line_frac"] == 0.5
    assert out[2]["top_bigram_share"] == 1.0                    # "spam spam" x4
    assert out[3]["dup_line_frac"] == 0.0
    assert out[3]["top_bigram_share"] == 0.25                   # 4 distinct bigrams


def test_repetition_features_zero_shuffle(spark):
    from debezium_connector_yugabytedb_1_spark.operators.text import repetition_features

    docs = _docs(spark, [(1, "a b a b", "en")])
    plan = repetition_features(docs)._jdf.queryExecution().executedPlan().toString()
    # the scale contract: one projection, no (doc, gram) shuffle, no Python
    assert "Exchange" not in plan and "Python" not in plan


def test_elect_survivors_keeps_unscored_docs(spark):
    """Regression: an inner join dropped grouped docs missing from scores —
    they must stay in the output (NULL score) and lose to scored mates;
    an all-unscored group still elects exactly one winner (min id)."""
    from debezium_connector_yugabytedb_1_spark.operators.dedup import elect_survivors

    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (8, 8), (9, 8)], "doc_id long, group_id long"
    )
    scores = spark.createDataFrame([(2, 5)], "doc_id long, score long")
    out = {r["doc_id"]: r["is_survivor"] for r in elect_survivors(groups, scores).collect()}
    assert out == {1: False, 2: True, 8: True, 9: False}


def test_rate_below_resolution_raises():
    from debezium_connector_yugabytedb_1_spark.operators.mixing import _rate_to_hex

    with pytest.raises(ValueError, match="resolution"):
        _rate_to_hex(1e-6)


# ------------------------------------------------- r7 scale-shape guards
def test_decontaminate_broadcast_guard_regimes(spark, tmp_path):
    # file-backed benchmark under the threshold → explicit broadcast hint;
    # over the threshold → hint dropped, planner picks a shuffle join when
    # auto-broadcast is off. Results identical in both regimes.
    docs = _docs(spark, [
        (1, "the quick brown fox jumps high", "en"),
        (2, "alpha beta gamma delta epsilon", "en"),
    ])
    bpath = str(tmp_path / "bench.parquet")
    _docs(spark, [(100, "quick brown fox jumps", "en")]).write.parquet(bpath)
    bench = spark.read.parquet(bpath)

    small = decontaminate(docs, bench, threshold=0.5)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small and "SortMergeJoin" not in plan_small

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = decontaminate(
            docs, bench, threshold=0.5, max_broadcast_input_bytes=0
        )
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_big  # hint really dropped
        rows_big = sorted(tuple(r) for r in big.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    rows_small = sorted(tuple(r) for r in small.collect())
    assert rows_small == rows_big


def _cum_window_reference(docs, budget, strata_col):
    # the original single-window formulation, as the equivalence oracle
    from pyspark.sql import Window
    from debezium_connector_yugabytedb_1_spark.functions import token_count

    toks = token_count(F.col("text")).cast("long")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = docs.select(
        F.col("doc_id"), F.col(strata_col), toks.alias("n_tokens")
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return out.withColumn(
        "chunk_id",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget)).cast("long"),
    )


def test_pack_sequences_two_pass_equivalent_and_parallel(spark):
    # dominant stratum (95% of rows) + a NULL stratum + non-contiguous ids
    rows = [(i * 3 + 7, f"w{i} " * ((i % 13) + 1), "web") for i in range(950)]
    rows += [(i * 3 + 8, f"c{i} tok", "code") for i in range(40)]
    rows += [(9999, "null stratum row", None)]
    docs = _docs(spark, rows)
    ref = sorted(tuple(r) for r in _cum_window_reference(docs, 50, "lang").collect())
    got = sorted(
        tuple(r) for r in pack_sequences(docs, budget=50, two_pass=True).collect()
    )
    assert got == ref
    # the two-pass window is scoped to (stratum, bucket), so the dominant
    # stratum's ledger is split across bucket partitions — visible in the
    # window spec of the plan
    plan = (
        pack_sequences(docs, budget=50, two_pass=True)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "_bkt" in plan


def test_pack_sequences_one_pass_unchanged(spark):
    docs = _docs(spark, [
        (1, "a b c d", "en"), (2, "e f g h", "en"), (3, "i j", "zh"),
    ])
    ref = sorted(tuple(r) for r in _cum_window_reference(docs, 6, "lang").collect())
    got = sorted(tuple(r) for r in pack_sequences(docs, budget=6, two_pass=False).collect())
    auto = sorted(tuple(r) for r in pack_sequences(docs, budget=6).collect())
    assert got == ref == auto


def test_pack_sequences_global(spark):
    docs = _docs(spark, [
        (1, "a b c d", "en"), (2, "e f g h", "zh"), (3, "i j k l", "de"),
    ])
    for tp in (False, True):
        out = {r["doc_id"]: r.asDict() for r in
               pack_sequences(docs, budget=6, strata_col=None, two_pass=tp).collect()}
        # one global sequence across strata, ordered by id: 4, 8, 12
        assert [out[i]["cum_tokens"] for i in (1, 2, 3)] == [4, 8, 12]
        assert [out[i]["chunk_id"] for i in (1, 2, 3)] == [0, 0, 1]
        assert "lang" not in out[1]


def test_stratified_sample_null_key_kept(spark):
    docs = spark.createDataFrame(
        [(None, "t", "zh"), (1, "t", "zh"), (None, "t", "xx")],
        "doc_id long, text string, lang string",
    )
    out = stratified_sample(docs, rates={"zh": 1.0}, strata_col="lang").collect()
    # rate-1.0 stratum keeps its NULL-keyed row; default_rate 0 drops 'xx'
    assert sorted((r["doc_id"] is None, r["lang"]) for r in out) == [
        (False, "zh"), (True, "zh"),
    ]
