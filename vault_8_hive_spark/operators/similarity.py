"""Vector-similarity expression builders (JVM-side, UDF-free).

All expressions operate on array<float> embedding columns, cast element-
wise to double first so both Spark and any oracle engine do the identical
IEEE arithmetic. Dot products are left-fold sums over explicit indices —
deterministic order, no platform SIMD reassociation.

Scale: these are whole-stage-codegen expressions; brute-force top-k is a
single pass + top-k (no shuffle of the corpus); the LSH variant buckets
the corpus so queries only scan their bucket (see queries/vectors.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(arr: Column | str) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product of two double arrays."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def sq_norm(a: Column) -> Column:
    """Sum of squares — the zero-vector domain test (`sq_norm(e) > 0`),
    shared by every query that must exclude norm-0 rows before cosine."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, TOTAL as an expression: the denominator is
    clamped with greatest(., 5e-324) so a zero-norm row yields 0.0
    instead of an ANSI DIVIDE_BY_ZERO. For any nonzero vector the clamp
    is the identity (real norms dwarf one denormal), so results are
    bit-identical to the plain division — but the expression is now safe
    to evaluate on ANY row, whatever order the optimizer runs filter
    conjuncts in (whole-stage codegen CSE can hoist a predicate's shared
    subexpression ABOVE the short-circuiting domain guard in the same
    Filter; seen live in the round-7 edge-corpus sweep). Zero-norm rows
    must still be EXCLUDED by callers (sq_norm > 0) — cosine is
    undefined there and the 0.0 is a sentinel, not a similarity."""
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(5e-324))


def lit_vec(values: list[float]) -> Column:
    # Built by PARSING one SQL array literal, not by F.lit(list):
    # PySpark's lit() marshals nested lists element-by-element over py4j
    # (~1 ms per element — 0.7 s for a 10x64 centroid matrix, measured;
    # it was the slowest "compile" in BENCH_r03), while one expr() string
    # is a single round trip (4 ms). repr() round-trips doubles exactly,
    # and the 'D' suffix pins the SQL literal type to DOUBLE, so the
    # resulting Literal node is identical.
    return F.expr("array(" + ",".join(repr(float(v)) + "D" for v in values) + ")")


def lit_matrix(rows: list[list[float]]) -> Column:
    """array<array<double>> literal via one parsed expression (see
    lit_vec for why not F.lit)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(v)) + "D" for v in row) + ")"
            for row in rows
        )
        + ")"
    )


def hyperplanes(n_planes: int, dim: int, seed: str = "vault8") -> list[list[float]]:
    """Deterministic ±1 random hyperplanes derived from md5(seed|plane|dim).

    Pure data (no RNG state), so the identical planes can be embedded as
    literals in an oracle SQL query or regenerated on any worker.
    """
    planes: list[list[float]] = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{j}".encode()).digest()[0]
            row.append(1.0 if h < 128 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(emb_double: Column, planes: list[list[float]], decimals: int = 6) -> Column:
    """Bit-string LSH signature: bit p = (round(dot(emb, plane_p), d) > 0).

    The rounding quantizes away last-ulp cross-engine drift so the bucket
    assignment is reproducible everywhere.
    """
    bits = [
        F.when(F.round(dot(emb_double, lit_vec(pl)), decimals) > 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for pl in planes
    ]
    return F.concat(*bits)
