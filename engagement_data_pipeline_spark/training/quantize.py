"""Scalar (per-dimension) int8 quantization of embedding vectors.

At 100 TB an embedding column is the dominant payload (64 float32
dims = 256 bytes/row); affine per-dimension quantization to uint8
codes cuts it 4x with bounded reconstruction error, which is how
production ANN stores (FAISS SQ8, ScaNN) hold billion-scale indexes
in memory. Spark shape:

* `quantize_fit` — per-dimension min/max as ONE aggregation over the
  corpus (2·d agg expressions on the array column — no explode, no
  shuffle beyond the final scalar combine; map-side partials make the
  exchange O(d) per task).
* `quantize_codes` — pure zero-shuffle projection: the stats row is
  cross-joined in as a broadcast literal (one row), codes =
  floor((x - min) / (max - min) * 255). Every op is IEEE-defined on
  doubles, and correctly-rounded division of a <= b cannot exceed
  1.0, so codes land in [0, 255] exactly and bit-identically in any
  engine; the belt-and-braces clamp is mirrored in the oracle.

Reconstruction (`dequant_error`) maps code c to the cell midpoint
min + (c + 0.5)·(max - min)/255, giving |x - recon| <= s/510 + eps
per dimension (s = max - min) — the bound pytest pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_fit(emb: DataFrame, dim: int,
                 vec_col: str = "embedding") -> DataFrame:
    """One-row frame (min_vec array<double>, max_vec array<double>):
    per-dimension corpus min/max in a single pass."""
    mins = F.array(*[F.min(F.col(vec_col)[i].cast("double"))
                     for i in range(dim)])
    maxs = F.array(*[F.max(F.col(vec_col)[i].cast("double"))
                     for i in range(dim)])
    return emb.agg(mins.alias("min_vec"), maxs.alias("max_vec"))


def _scale(i) -> object:
    """Per-dim scale; a constant dimension quantizes to code 0 via
    scale 1 (numerator is exactly 0)."""
    s = F.col("max_vec")[i] - F.col("min_vec")[i]
    return F.when(s == 0.0, F.lit(1.0)).otherwise(s)


def quantize_codes(emb: DataFrame, stats: DataFrame, dim: int,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """(id, codes array<int>): affine uint8 code per dimension.
    Zero-shuffle: `stats` is one row, broadcast by the optimizer."""
    x = lambda i: F.col(vec_col)[i].cast("double")  # noqa: E731
    code = lambda i: F.greatest(F.lit(0), F.least(F.lit(255), F.floor(
        (x(i) - F.col("min_vec")[i]) / _scale(i) * F.lit(255.0))
        .cast("int")))  # noqa: E731
    return (emb.crossJoin(F.broadcast(stats))
            .select(F.col(id_col),
                    F.array(*[code(i) for i in range(dim)]).alias("codes")))


def dequant_error(emb: DataFrame, stats: DataFrame, dim: int,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """(id, codes, max_abs_err): reconstruction error of the midpoint
    dequantizer — still a pure projection; the max over dimensions is
    order-insensitive, so it is exact cross-engine."""
    x = lambda i: F.col(vec_col)[i].cast("double")  # noqa: E731
    code = lambda i: F.greatest(F.lit(0), F.least(F.lit(255), F.floor(
        (x(i) - F.col("min_vec")[i]) / _scale(i) * F.lit(255.0))
        .cast("int")))  # noqa: E731
    # a constant dimension reconstructs exactly (the midpoint shift
    # of the scale-1 fallback would otherwise cost 1/510 of error on
    # a dimension that carries none — caught by hypothesis)
    span = lambda i: F.col("max_vec")[i] - F.col("min_vec")[i]  # noqa: E731
    recon = lambda i: F.when(  # noqa: E731
        span(i) == 0.0, F.col("min_vec")[i]).otherwise(
        F.col("min_vec")[i]
        + (code(i).cast("double") + F.lit(0.5))
        * (_scale(i) / F.lit(255.0)))
    err = F.greatest(*[F.abs(x(i) - recon(i)) for i in range(dim)])
    return (emb.crossJoin(F.broadcast(stats))
            .select(F.col(id_col),
                    F.array(*[code(i) for i in range(dim)]).alias("codes"),
                    err.alias("max_abs_err")))
