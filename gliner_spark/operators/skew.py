"""Skew handling: hot-key detection + salted equi-join (SURVEY §4 item 1).

The Zipf head of entity surfaces ("acme corp" in millions of docs) makes
any join keyed on surface/entity skewed. Defenses, in order of preference:

1. aggregate FIRST (operators/linking.surface_table): mention-level skew
   collapses to one row per distinct surface before any join;
2. broadcast the small side (rewrite_triples default): no shuffle of the
   skewed fact side at all;
3. AQE skew-join splitting (on in session.py) for residual imbalance;
4. explicit salting (this module) for big-x-big joins on skewed keys where
   broadcast is impossible — the fact side gets a deterministic salt in
   [0, S), the dim side is replicated S times, and the join key becomes
   (key, salt), spreading each hot key over S reducers.

Two-pass variant: detect hot keys with a cheap count, salt ONLY those
(replication cost S x |hot| instead of S x |dim|).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, keys: List[str], min_count: int) -> DataFrame:
    """Keys whose row count exceeds min_count (the broadcastable hot list)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > min_count)
        .select(*keys)
    )


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: List[str],
    salt: int = 8,
    fact_salt_cols: Optional[List[str]] = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: fact rows get a DETERMINISTIC salt from
    their non-key columns (so results are reproducible across retries —
    never rand()); dim rows are replicated across all salt values.

    Result == fact.join(dim, keys, how) for inner/left/left_semi/left_anti;
    right/full outer are rejected: an unmatched dim row appears once per
    salt replica (S times) under this scheme, so the identity breaks.
    Each hot key's rows spread over `salt` reducers. Output drops the salt
    column.
    """
    assert how in ("inner", "left", "leftouter", "left_outer", "left_semi",
                   "leftsemi", "left_anti", "leftanti"), (
        f"salted_equi_join does not preserve {how!r} semantics: unmatched "
        f"dim rows would be replicated {salt}x; dedupe them or use AQE "
        f"skew-join for outer joins"
    )
    sc = fact_salt_cols or [c for c in fact.columns if c not in keys][:2] or keys
    f_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in sc]), F.lit(salt)).cast("int")
    )
    d_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return f_s.join(d_s, keys + ["_salt"], how).drop("_salt")
