"""Duplicate-group resolution: distributed connected components over the
near-dup pair output + survivor election (min doc_id per component).
Transitive chains (A~B, B~C, A≁C) must collapse into one group."""

from pyspark.sql import functions as F

from debezium_connector_yugabytedb_1_spark.operators.dedup import (
    ngram_jaccard_pairs,
    resolve_groups,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def _collect(groups):
    return {
        r["doc_id"]: (r["group_id"], r["is_survivor"]) for r in groups.collect()
    }


def test_transitive_chain_collapses_to_one_group(spark):
    chain = [(i, i + 1) for i in range(1, 33)]  # 1-2-3-...-33
    other = [(101, 100), (101, 102)]  # second component, reversed edge too
    got = _collect(resolve_groups(_pairs(spark, chain + other)))
    assert {d for d, (g, _) in got.items() if g == 1} == set(range(1, 34))
    assert {d for d, (g, _) in got.items() if g == 100} == {100, 101, 102}
    assert {d for d, (_, s) in got.items() if s} == {1, 100}


def test_pointer_jumping_converges_in_log_rounds(spark):
    """A 33-node chain has diameter 32: naive min-propagation needs ~32
    rounds, pointer jumping must finish well within 8."""
    chain = [(i, i + 1) for i in range(1, 33)]
    got = _collect(resolve_groups(_pairs(spark, chain), max_iters=8))
    assert all(g == 1 for g, _ in got.values())


def test_isolated_pair_and_self_consistency(spark):
    got = _collect(resolve_groups(_pairs(spark, [(7, 3)])))
    assert got == {3: (3, True), 7: (3, False)}


def test_composes_with_jaccard_pairs(spark):
    """End-to-end: near-dup chain A~B~C with A≁C through the real pair
    operator lands in one group with the min doc_id as survivor."""
    w = [f"w{i}" for i in range(20)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(w[0:12])),
            (2, " ".join(w[4:16])),
            (3, " ".join(w[8:20])),
            (4, "completely different text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, k=1, threshold=0.5)
    assert {
        (r["doc_a"], r["doc_b"]) for r in pairs.select("doc_a", "doc_b").collect()
    } == {(1, 2), (2, 3)}
    got = _collect(resolve_groups(pairs))
    assert got == {1: (1, True), 2: (1, False), 3: (1, False)}


def test_near_dup_groups_batch_and_incremental(spark, tmp_path):
    """The full dedup story in anger over NEAR-dup pairs: a transitive
    chain A~B~C with A≁C must land in ONE group with one survivor — both
    through batch ``minhash_lsh_pairs`` and through ``MinHashIndex.add``
    increments that only ever see part of the chain at a time."""
    from debezium_connector_yugabytedb_1_spark.operators.dedup import (
        MinHashIndex,
        minhash_lsh_pairs,
    )

    w = [f"tok{i}" for i in range(24)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(w[0:12])),   # J(1,2)=9/15=0.60, J(2,3)=0.60
            (2, " ".join(w[3:15])),   # J(1,3)=6/18=0.33 — chain, not clique
            (3, " ".join(w[6:18])),
            (4, "entirely unrelated content nothing shared here zero"),
        ],
        "doc_id long, text string",
    )
    geo = dict(k=1, n_hashes=64, bands=16, threshold=0.55)

    def assert_chain(pairs):
        assert {
            (r["doc_a"], r["doc_b"])
            for r in pairs.select("doc_a", "doc_b").collect()
        } == {(1, 2), (2, 3)}
        got = _collect(resolve_groups(pairs))
        assert got == {1: (1, True), 2: (1, False), 3: (1, False)}

    assert_chain(minhash_lsh_pairs(docs, **geo))
    # incremental: the chain is discovered across two adds (2~3 spans them)
    idx = MinHashIndex(spark, str(tmp_path / "nd_idx"), **geo)
    p1 = idx.add(docs.where("doc_id in (1, 2)"))
    p2 = idx.add(docs.where("doc_id in (3, 4)"))
    assert_chain(p1.unionByName(p2))
