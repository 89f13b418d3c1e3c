"""Vector math over ``array<float|double>`` columns — pure ``pyspark.sql.functions``.

The reference computes cosine similarity as a Python ``Vector.dot`` inside an
RDD UDF against a driver-broadcast dict (``/root/reference/COMP5349_2.py:29-47``).
Here the same math is expressed with JVM-side higher-order functions
(``zip_with`` + ``aggregate``), so it runs inside whole-stage codegen with no
Python boundary at all. Embeddings stay ``array<double>`` (not VectorUDT) so
they are SQL-native, Arrow-transferable, and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    """Cast array<float> → array<double> so sums accumulate in fp64 (matches
    the DuckDB oracle, which we also force to DOUBLE[])."""
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two numeric array columns (left-fold, in array order)."""
    a, b = as_double_array(a), as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe denominator (0-vector → NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def l2_normalize(a: Column | str) -> Column:
    """L2-normalize an array column (the Normalizer(p=2) semantics of
    COMP5349_2.py:174-178, minus the VectorUDT detour)."""
    a = as_double_array(a)
    n = l2_norm(a)
    return F.when(n != 0, F.transform(a, lambda x: x / n)).otherwise(a)
