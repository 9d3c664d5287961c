"""Skew mitigation utilities.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
join skew at runtime, but two cases still need explicit salting at
100 TB:

- joining a hot-keyed fact table to a mid-size dim that is too big to
  broadcast (one reducer would receive the whole hot key's partition);
- pre-aggregating a hot key before a second-stage exact aggregate.

`salted_join` is the explicit tool: the fact side spreads each key
across `salt` sub-keys (uniform pseudo-random — the salt only balances
partitioning, results are identical for any salt draw), the dim side
replicates each row `salt` times via a small explode.  Shuffle volume
grows by salt× on the DIM side only — that is the trade: salt the join
when |dim| × salt ≪ hot-key volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt: int = 16, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Equi-join fact⋈dim on `key` with the hot-key shuffle spread over
    `salt` sub-partitions.  Supported `how`: inner / left (fact-
    perspective joins; right/full would need the salt on both sides)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed) * salt).cast("int"))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return (
        salted_fact.join(salted_dim, [key, "_salt"], how)
        .drop("_salt")
    )
