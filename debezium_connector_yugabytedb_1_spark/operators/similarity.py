"""Similarity search over an embedding column (``array<float>``):
brute-force cosine top-k (exact baseline) and two scale paths: an
LSH-bucketed variant and an IVF (inverted-file) variant with a
sample-trained coarse quantizer.

Brute force: queries x corpus join with JVM-expression cosine — no UDF, no
Python. For Q queries it is a broadcast of Q rows against a full corpus
scan: linear in corpus size, embarrassingly parallel, the right baseline
even at 100 TB when Q is small.

Scale path: random-hyperplane LSH — 64 signed projections → b-bit bucket
keys; neighbors are searched only within matching buckets across multiple
independent tables. Projections are deterministic (seeded hash of
(table, plane, dim)) so signatures are reproducible across runs/cluster
sizes. Vectorized numpy via mapInPandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine_similarity
from .dedup import _spread


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (self-matches excluded). Output:
    (query_id, neighbor_id, rank). Ties broken by neighbor_id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = _spread(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _planes(n_planes: int, dim: int, table: int, seed: int = 7) -> np.ndarray:
    """Deterministic hyperplanes: standard-normal via seeded Generator keyed
    by (seed, table) — identical on every executor and cluster size."""
    rng = np.random.default_rng(abs(hash((seed, table))) % (2**32))
    return rng.standard_normal((n_planes, dim))


def lsh_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 7,
    *,
    dim: int,
) -> DataFrame:
    """Random-hyperplane signatures: one (id, table, bucket) row per table.
    mapInPandas with matrix multiply per Arrow batch — vectorized.

    ``dim`` is REQUIRED (keyword-only): inferring it would cost a
    driver-side ``first()`` action in the plan-build path — a hidden scan
    that serializes into every caller's pipeline."""
    planes = [_planes(n_planes, dim, t, seed) for t in range(n_tables)]
    n_t = n_tables

    def sign(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            outs = []
            for t in range(n_t):
                bits = (mat @ planes[t].T) > 0
                bucket = bits.dot(1 << np.arange(bits.shape[1], dtype=np.int64))
                outs.append(
                    pd.DataFrame(
                        {"vec_id": pdf[id_col].values, "table": t, "bucket": bucket}
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(
        sign, schema="vec_id long, table int, bucket long"
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 6,
    *,
    dim: int,
) -> DataFrame:
    """Approximate top-k: candidates = bucket collisions in any table, then
    exact cosine re-rank of candidates only. ``dim`` is required — see
    ``lsh_signatures``."""
    sig_c = lsh_signatures(corpus, vec_col, id_col, n_planes, n_tables, dim=dim)
    sig_q = lsh_signatures(
        queries, vec_col, id_col, n_planes, n_tables, dim=dim
    ).withColumnRenamed("vec_id", "query_id")
    cand = (
        sig_q.join(sig_c, ["table", "bucket"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", cosine_similarity(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ------------------------------------------------------------------- IVF
def ivf_train(
    corpus: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    sample: int = 20_000,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Train the IVF coarse quantizer: Lloyd k-means on a bounded sample,
    seeded init — deterministic across runs and cluster sizes. The train
    step is the standard IVF recipe (FAISS-style): at 100 TB you still
    train on a driver-side sample of ~10^4-10^5 vectors; only assignment
    and search are distributed. Returns (n_lists, dim) centroids."""
    rows = corpus.select(vec_col).limit(sample).collect()
    mat = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_lists, len(mat)), replace=False)]
    for _ in range(iters):
        # cosine assignment: normalize once, argmax of dot products
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        assign = (mn @ cn.T).argmax(axis=1)
        for j in range(len(cent)):
            members = mat[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
    return cent


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    out_id: str = "vec_id",
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroid lists (cosine).
    Broadcast centroids + one vectorized matmul per Arrow batch; output
    (id, list_id) rows — ``nprobe=1`` for corpus indexing, >1 for query
    probing."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    def assign(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ cn.T
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    out_id: np.repeat(pdf[id_col].values, nprobe),
                    "list_id": top.reshape(-1).astype(np.int64),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{out_id} long, list_id long"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors partitioned into ``n_lists``
    inverted lists by nearest centroid; each query probes its ``nprobe``
    nearest lists and exact-reranks only those candidates. Cost per query
    ~ nprobe/n_lists of the corpus — recall tracks that fraction on
    unclustered (near-uniform) embeddings, and far exceeds it on clustered
    real corpora — the FAISS IVF-Flat plan re-expressed
    as a list_id equi-join (shuffle on list_id; at scale, persist the
    assignment bucketed by list_id and the probe join is shuffle-free on
    the corpus side)."""
    cent = ivf_train(corpus, n_lists, vec_col, seed=seed)
    c_assign = ivf_assign(corpus, cent, id_col, vec_col, nprobe=1)
    q_probe = ivf_assign(queries, cent, id_col, vec_col, nprobe=nprobe, out_id="query_id")
    cand = (
        q_probe.join(c_assign, "list_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", cosine_similarity(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 6,
    *,
    dim: int,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) via LSH candidates +
    exact verify. ``dim`` is required — see ``lsh_signatures``."""
    sig = lsh_signatures(df, vec_col, id_col, n_planes, n_tables, dim=dim)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", cosine_similarity(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
