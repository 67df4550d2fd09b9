"""Grouped feature normalization over embedding columns — the
training-data preprocessing step (per-group z-score / centering).

Two implementations with identical semantics:

- ``normalize_by_group`` — native: explode to (id, label, dim, value),
  join per-(label, dim) moments, re-assemble with ``array_agg`` ordered
  by dim. All codegen'd relational ops; oracle-checkable; the default.
- ``normalize_by_group_pandas`` — ``applyInPandas`` grouped-map: one
  numpy pass per label group. Fewer shuffles (one) and dense-matrix
  arithmetic; the right shape when groups fit in executor memory and
  dimensionality is high. Equivalence-tested against the native form.

Population std (ddof=0); zero-variance dims normalize to 0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_by_group(
    df: DataFrame,
    vec_col: str,
    group_col: str,
    id_col: str = "vec_id",
    round_moments: int | None = 6,
) -> DataFrame:
    """z-score per (group, dimension), native relational form.

    ``round_moments`` rounds μ/σ before applying them: float summation
    order differs across engines (and across partitionings of the same
    engine), so the raw moments carry last-ulp noise; rounding them makes
    the OUTPUT bitwise-reproducible — the property the differential
    harness (and any regression-diff of two pipeline runs) needs. Pass
    None for exact moments.
    """
    exploded = df.select(
        F.col(id_col), F.col(group_col), F.posexplode(F.col(vec_col)).alias("dim", "v")
    ).select(id_col, group_col, "dim", F.col("v").cast("double").alias("v"))
    mu = F.avg("v")
    sigma = F.sqrt(F.avg(F.col("v") * F.col("v")) - F.avg("v") * F.avg("v"))
    if round_moments is not None:
        mu = F.round(mu, round_moments)
        sigma = F.round(sigma, round_moments)
    moments = exploded.groupBy(group_col, "dim").agg(
        mu.alias("mu"), sigma.alias("sigma")
    )
    z = (
        exploded.join(F.broadcast(moments), [group_col, "dim"])
        .select(
            id_col,
            group_col,
            "dim",
            F.when(F.col("sigma") > 0, (F.col("v") - F.col("mu")) / F.col("sigma"))
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
    )
    return (
        z.groupBy(id_col, group_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "z"))).alias("__pairs"))
        .select(
            id_col,
            group_col,
            F.transform(F.col("__pairs"), lambda p: p["z"]).alias("z_embedding"),
        )
    )


def normalize_by_group_pandas(
    df: DataFrame, vec_col: str, group_col: str, id_col: str = "vec_id"
) -> DataFrame:
    """Same semantics via applyInPandas grouped-map (one shuffle, numpy
    matrix math inside)."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            df.schema[group_col],
            T.StructField("z_embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def norm_group(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        mu = m.mean(axis=0)
        sigma = np.sqrt((m * m).mean(axis=0) - mu * mu)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sigma > 0, (m - mu) / sigma, 0.0)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                group_col: pdf[group_col].values,
                "z_embedding": list(z),
            }
        )

    return df.select(id_col, group_col, vec_col).groupBy(group_col).applyInPandas(
        norm_group, out_schema
    )
