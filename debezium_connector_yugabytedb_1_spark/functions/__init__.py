"""Scalar/vector function layer (P2 analogue + training-pipeline functions).

Everything here is either a JVM built-in composition (preferred: whole-stage
codegen) or an Arrow-batched pandas UDF (allowed by the north rule; never
per-row Python).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- hashing
def content_sha256(col: Column | str, impl: str = "builtin") -> Column:
    """sha256 hex of a string column — the BASELINE per-row invariant.

    ``builtin`` uses JVM ``sha2`` (codegen, fastest); ``pandas`` is the
    Arrow-vectorized equivalent (demonstrates the mandated UDF path)."""
    c = F.col(col) if isinstance(col, str) else col
    if impl == "builtin":
        return F.sha2(c, 256)
    return _sha256_pandas(c)


@F.pandas_udf(T.StringType())
def _sha256_pandas(s: pd.Series) -> pd.Series:
    return s.map(lambda x: hashlib.sha256(x.encode()).hexdigest() if x is not None else None)


def norm_tokens(col: Column | str) -> Column:
    """THE canonical token split every text operator shares (shingles,
    fingerprints, simhash, bigrams): lowercase → collapse whitespace runs →
    trim → split on single space. This expression is also the Spark twin of
    the DuckDB oracle's ``_TOK_NORM`` — keep them in lockstep or oracle
    equivalence silently breaks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " ")


def rolling_fingerprint(col: Column | str, *, normalize: bool = True) -> Column:
    """Document fingerprint: md5 over the normalized token multiset
    (lowercase, whitespace-collapsed, sorted distinct tokens). Pure JVM."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.concat_ws(" ", F.array_sort(F.array_distinct(norm_tokens(c))))
    return F.md5(c)


# ---------------------------------------------------------------- text
TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")


def token_count(col: Column | str, pattern: str = TOKEN_RE) -> Column:
    """BPE-ish token count: word-or-single-punct regex matches (JVM)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))


def stopword_count(col: Column | str, stopwords=EN_STOPWORDS) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), r"\s+")
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Array of k-word shingles (JVM: split + transform over a sequence)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = norm_tokens(c)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
                ),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


# ---------------------------------------------------------------- vectors
def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two array<float/double> columns — pure JVM
    (zip_with + aggregate), no UDF."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def l2_norm(a: Column) -> Column:
    da = F.transform(a, lambda x: x.cast("double"))
    return F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))
