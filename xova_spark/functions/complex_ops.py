"""Complex-number column algebra over (re, im) double pairs.

Spark has no complex type; the reference's complex64 visibilities
(reference: xova/apps/xova/averaging.py:150-157, testing_data.py:28,38)
are encoded as paired double columns. Keeping the (re, im) discipline in
one module is the SURVEY §7 "hard parts" recommendation.

All helpers return Column expressions — pure Catalyst, codegen-friendly,
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def c_add(re1: Column, im1: Column, re2: Column, im2: Column) -> tuple[Column, Column]:
    return re1 + re2, im1 + im2


def c_sub(re1: Column, im1: Column, re2: Column, im2: Column) -> tuple[Column, Column]:
    return re1 - re2, im1 - im2


def c_mul(re1: Column, im1: Column, re2: Column, im2: Column) -> tuple[Column, Column]:
    """(re1 + i·im1) · (re2 + i·im2)."""
    return re1 * re2 - im1 * im2, re1 * im2 + im1 * re2


def c_conj(re: Column, im: Column) -> tuple[Column, Column]:
    return re, -im


def c_abs(re: Column, im: Column) -> Column:
    return F.sqrt(re * re + im * im)


def c_abs2(re: Column, im: Column) -> Column:
    return re * re + im * im


def c_scale(re: Column, im: Column, s: Column) -> tuple[Column, Column]:
    return re * s, im * s


def c_div(re1: Column, im1: Column, re2: Column, im2: Column) -> tuple[Column, Column]:
    d = c_abs2(re2, im2)
    return (re1 * re2 + im1 * im2) / d, (im1 * re2 - re1 * im2) / d


def c_weighted_sum(re: Column, im: Column, w: Column) -> tuple[Column, Column]:
    """Aggregate expressions: sum(w·x) per component (use inside .agg())."""
    return F.sum(w * re), F.sum(w * im)
