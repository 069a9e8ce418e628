"""Vector math as Column expressions (SURVEY.md §2.8 V-ops).

The reference computes distances inside Milvus (vdb.py:88-100, metric
COSINE/IP/L2 per config.yml:80).  Here distance is a JVM-side higher-order
function over array<double> — no Python, no UDF — so similarity joins stay
inside whole-stage codegen and scale with the cluster.

All inputs are cast to array<double> first: fixture embeddings are
array<float> and float accumulation would diverge from the (double-based)
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — matches DuckDB list_dot_product on
    DOUBLE[] to ~1 ulp."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # eps floor on the denominator: an all-zero vector scores ~0 instead
    # of NaN (NaN sorts FIRST under desc in Spark, so zero embeddings
    # ranked as best hits; the arrow scorer applies the same floor).  For
    # every nonzero vector greatest(x, eps) == x, so oracle parity is
    # untouched.
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def l2_sq(a: Column) -> Column:
    """Squared L2 distance between two vectors zipped as diffs."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def l2(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.sqrt(l2_sq(diff))


# Metric semantics (V5, vdb.py:20-22,155-166): COSINE/IP rank descending
# (larger is better), L2 ranks ascending.
METRIC_DESCENDING = {"COSINE": True, "IP": True, "L2": False}


def center_vectors_per_group(
    df, group_col: str, vec_col: str = "embedding", id_col: str = "vec_id"
):
    """Grouped-map applyInPandas: subtract each group's mean vector
    (per-cluster centering before residual indexing — the grouped-map UDF
    kind of SURVEY §2.10, numpy-vectorized per group).

    One shuffle on the group key; each group's rows are centered in a
    single pandas call.  Returns (id, group, centered array<double>).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[id_col],
            df.schema[group_col],
            T.StructField("centered", T.ArrayType(T.DoubleType())),
        ]
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        mat = mat - mat.mean(axis=0, keepdims=True)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                group_col: pdf[group_col].values,
                "centered": list(mat),
            }
        )

    return df.select(id_col, group_col, vec_col).groupBy(group_col).applyInPandas(
        center, schema=out_schema
    )


def score_expr(metric: str, a: Column, b: Column) -> Column:
    m = metric.upper()
    if m == "COSINE":
        return cosine(a, b)
    if m == "IP":
        return dot(a, b)
    if m == "L2":
        return l2(a, b)
    raise ValueError(f"unknown metric {metric!r}")
