"""Training-corpus curation operators — the data-mixing layer a 100 TB
pretraining pipeline runs AFTER dedup/quality and BEFORE sharding:

- ``decontaminate``     benchmark (test-set) n-gram overlap per document —
                        the decontamination pass every published corpus
                        (C4, The Pile, RefinedWeb) applies so evaluation
                        data does not leak into training data.
- ``stratified_sample`` deterministic per-stratum hash sampling — corpus
                        mixing weights ("keep 10%% of web, 100%% of code")
                        reproducible across runs and engines: membership is
                        a pure function of (seed, key), no RNG state.
- ``pack_sequences``    token-budget chunk assignment (sequence packing) —
                        maps each document to the training shard whose
                        token window it starts in.

Scale notes (100 TB contract):
- ``decontaminate``: the benchmark side is SMALL by definition (eval sets
  are thousands of docs) — its distinct shingle set is broadcast, so the
  corpus pays one shingle projection + one map-side-combinable
  ``groupBy(doc_id)``; no corpus-side shuffle on the shingle key.
- ``stratified_sample`` is a pure filter projection — zero shuffles, zero
  driver state; the md5-prefix threshold compares lexicographically so
  ANY engine (Spark, DuckDB, a SQL warehouse) reproduces the same sample.
- ``pack_sequences`` cumulative-sums within each stratum partition:
  per-stratum windows parallelize across strata and each stratum's sum is
  one sort within its partition. Packing is sequential BY CONTRACT (chunk
  boundaries depend on every earlier document), so a single global order
  would serialize — stratum-scoped packing (the realistic shape: shards
  are per-language / per-source anyway) keeps the longest chain one
  stratum, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import token_count, word_shingles
from .dedup import _spread


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document overlap with a benchmark's k-shingle set.

    Output: (doc_id, n_shingles, n_overlap, overlap_frac, contaminated)
    where ``overlap_frac = n_overlap / n_shingles`` over the document's
    DISTINCT shingles and ``contaminated = overlap_frac >= threshold``.
    Every document appears in the output (docs with no shingle hits have
    ``n_overlap = 0``) — the caller anti-joins to drop contaminated ids.
    """
    bench = F.broadcast(
        benchmark.select(
            F.explode(word_shingles(text_col, k)).alias("shingle")
        ).distinct()
    )
    sh = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, k)).alias("shingle"),
    )
    # one broadcast-hash left join (marker column), one combinable agg —
    # the corpus is never shuffled on the shingle key
    marked = sh.join(
        bench.withColumn("_hit", F.lit(1)), "shingle", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_overlap"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap") / F.col("n_shingles")).alias("overlap_frac"),
            (F.col("n_overlap") / F.col("n_shingles") >= F.lit(threshold)).alias(
                "contaminated"
            ),
        )
    )


def _rate_to_hex(rate: float) -> str:
    """Sampling rate → 4-hex-digit lexicographic threshold (md5-prefix
    space is uniform, so P[prefix < hex(rate·65536)] = rate to 1/65536)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    n = int(rate * 65536)
    if n == 0 and rate > 0.0:
        # silently keeping ZERO rows from a stratum the caller asked to
        # sample is the worst failure mode — surface the resolution floor
        raise ValueError(
            f"rate {rate} is below the 1/65536 resolution of the 4-hex-char "
            "threshold; use a coarser rate or pre-filter the stratum"
        )
    # rate 1.0 must beat every hex prefix; "10000" would LOSE the
    # lexicographic compare to "2000"+ (string order, not numeric) — 'g'
    # sorts above every hex digit
    return "g000" if n >= 65536 else format(n, "04x")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the first 4 hex
    chars of ``md5(seed ':' key)`` sort below the stratum's rate threshold.

    Unlike ``df.sample``, membership is a pure function of (seed, key) —
    re-runs, retries, and other engines reproduce the exact sample, and a
    document keeps/loses membership independent of partitioning. Unknown
    strata fall to ``default_rate``."""
    h = F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))), 1, 4
    )
    thr = F.lit(_rate_to_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(_rate_to_hex(rate))).otherwise(
            thr
        )
    return docs.where(h < thr)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget chunk assignment: within each stratum (ordered by id),
    ``chunk_id = floor(starting_token_offset / budget)`` — the training
    shard whose token window the document STARTS in.

    Output: (doc_id, <strata_col>, n_tokens, cum_tokens, chunk_id) with
    ``cum_tokens`` = inclusive running total. The offset-based rule (vs
    greedy first-fit) is order-deterministic, engine-reproducible, and
    window-expressible; long documents may straddle chunk boundaries,
    which sequence-packing trainers handle by splitting at the boundary.
    """
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    # the SAME tokenizer quality_features/token-count queries use — an
    # inline copy would silently diverge from their n_tokens if the BPE-ish
    # rule ever changes
    toks = token_count(F.col(text_col)).cast("long")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    withcum = docs.select(
        F.col(id_col).alias("doc_id"), F.col(strata_col), toks.alias("n_tokens")
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return withcum.withColumn(
        "chunk_id",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget)).cast(
            "long"
        ),
    )
