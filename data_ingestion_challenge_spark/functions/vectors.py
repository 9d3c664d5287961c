"""Vector math over array<float> embedding columns.

Two tiers:

- Catalyst higher-order folds (dotp/norm2/cosine): declarative, exact
  sequential accumulation.  BUT higher-order lambdas are interpreted
  per element (no codegen, no CSE) — fine for a few thousand rows,
  wrong for batch scoring.
- Arrow-vectorized pandas UDFs (cosine_batch/norm2_batch): numpy does
  the arithmetic over whole record batches — the hot path for ANN and
  pair scoring.  float32→float64 widening matches the SQL oracles;
  accumulation-order differences vs a sequential fold are ~1e-15
  relative, far below the 4-decimal rounding every query applies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dotp(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0).cast("double"),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dotp(a, b) / (norm2(a) * norm2(b))


# The pandas_udf decorators parse their DDL type against the ACTIVE
# session, so the UDF objects are built lazily at call time, not at
# module import (imports must work before any SparkSession exists).

def cosine_batch(a: Column, b: Column) -> Column:
    @pandas_udf("double")
    def _cos(sa: pd.Series, sb: pd.Series) -> pd.Series:
        A = np.stack(sa.to_numpy()).astype(np.float64)
        B = np.stack(sb.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        return pd.Series(dots / (na * nb))
    return _cos(a, b)


def norm2_batch(a: Column) -> Column:
    @pandas_udf("double")
    def _norm(sa: pd.Series) -> pd.Series:
        A = np.stack(sa.to_numpy()).astype(np.float64)
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", A, A)))
    return _norm(a)
