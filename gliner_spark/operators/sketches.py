"""Mergeable integer sketches — the approximate-counting family a 100 TB
pipeline runs where exact per-key state is too big, built so the sketch
itself is EXACTLY deterministic (integer cells, engine-replayable hashes)
even though the estimates it yields are approximate.

Count-min sketch (Cormode & Muthukrishnan 2005):
- build: every token increments cell (j, h_j(token) % width) for each of
  `depth` rows — ONE map-side-combined aggregate whose result is a fixed
  depth x width integer grid regardless of corpus size. Sketches merge by
  cell-wise SUM, so per-partition partial sketches combine exactly like
  any other partial aggregate — the property that makes this the 100 TB
  shape (and the streaming shape: micro-batch sketches add).
- query: est(token) = min_j cell(j, h_j(token)) — always >= the true
  count (only overestimates, from hash collisions), within eps*N with
  probability 1-delta for width=ceil(e/eps), depth=ceil(ln(1/delta)).

Hashes are the shared fold/affine family (functions/text — pure integer
arithmetic), so the ANSI-SQL oracle rebuilds the identical grid and the
gate compares exact cells, not just estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gliner_spark.functions.text import affine_hash, fold_hash

CMS_DEPTH = 4
CMS_WIDTH = 256


def _bucket(tok_hash, j: int, width: int):
    return F.pmod(affine_hash(tok_hash, j), F.lit(width))


def cms_build(
    docs: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """(j, bucket, cnt) count-min grid over whitespace tokens — one
    explode + one grouped sum (map-side partial); depth*width rows out."""
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).select(fold_hash(F.col("tok")).alias("h"))
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col("h"), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.j", "c.bucket")
    return cells.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_estimate_topk(
    docs: DataFrame,
    k: int = 10,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Exact-vs-sketch comparison for the k globally most frequent tokens
    (deterministic tie-break: count desc, token asc): (tok, n_exact,
    n_cms) with n_cms >= n_exact guaranteed by construction.

    The probe side is tiny (k rows x depth lookups, broadcast); the sketch
    is depth x width rows. Exact counts here exist only to ground the
    gate — at 10^12 rows a consumer keeps just the sketch."""
    sketch = cms_build(docs, depth, width)
    exact = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    # top-k via orderBy+limit (TakeOrdered — per-partition partial top-k,
    # no global window over the vocabulary)
    probes = (
        exact.orderBy(F.desc("n_exact"), F.asc("tok"))
        .limit(k)
        .withColumn("h", fold_hash(F.col("tok")))
    )
    lookups = probes.select(
        "tok",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col("h"), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select("tok", "n_exact", "c.j", "c.bucket")
    return (
        F.broadcast(lookups)
        .join(sketch, ["j", "bucket"])
        .groupBy("tok", "n_exact")
        .agg(F.min("cnt").cast("long").alias("n_cms"))
        .orderBy(F.desc("n_exact"), F.asc("tok"))
    )
