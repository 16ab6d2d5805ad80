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

from gliner_spark.functions.text import P31, affine_hash, fold_hash

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


# --- HyperLogLog (Flajolet et al. 2007), exact-integer register variant --
HLL_P = 6                   # 2^6 = 64 registers per key
HLL_M = 1 << HLL_P
HLL_REST_BITS = 25          # fold_hash < 2^31 => h DIV 64 < 2^25 exactly
HLL_ALPHA_MICRO = 709373    # alpha_64 = 0.7213/(1 + 1.079/64), micro-units
HLL_MIX_A = 48271           # affine step of the mid-square scramble
# estimate numerator alpha * m^2 * 2^(REST_BITS+1), precomputed so the
# whole estimator is one 64-bit integer division (fits: ~1.95e17)
HLL_EST_NUM = HLL_ALPHA_MICRO * HLL_M * HLL_M * (1 << (HLL_REST_BITS + 1))


def _hll_rho(rest):
    """rho = 1 + leading zeros of the REST_BITS-bit value = REST_BITS+1 -
    bit_length(rest) — a CASE chain over the 25 power-of-two thresholds
    (no log2: IEEE log of a near-power-of-two is not oracle-safe)."""
    bitlen = F.when(rest >= 1 << (HLL_REST_BITS - 1), HLL_REST_BITS)
    for b in range(HLL_REST_BITS - 1, 0, -1):
        bitlen = bitlen.when(rest >= 1 << (b - 1), b)
    bitlen = bitlen.otherwise(0)
    return F.lit(HLL_REST_BITS + 1) - bitlen


def _hll_pow2(m):
    """2^(REST_BITS+1-m) for register value m in [1, REST_BITS+1], as a
    CASE map (Spark's shiftleft takes only a literal shift amount)."""
    expr = F.when(m == 1, F.lit(1 << HLL_REST_BITS).cast("long"))
    for mm in range(2, HLL_REST_BITS + 2):
        expr = expr.when(
            m == mm, F.lit(1 << (HLL_REST_BITS + 1 - mm)).cast("long")
        )
    return expr


def hll_build(triples: DataFrame) -> DataFrame:
    """Per-predicate HyperLogLog registers over the object column:
    (pred, bucket, m) with bucket = fold_hash(obj) % 64 and m = max over
    objects of rho(h DIV 64). ONE map-side-combined max aggregate whose
    result is <= 64 rows per key regardless of corpus size; registers
    from disjoint corpus slices (or streaming micro-batches) merge by
    cell-wise MAX — the same mergeability contract as the CMS grid,
    which is what lets a 100 TB run keep per-key distinct-count state in
    kilobytes instead of a distinct shuffle per key."""
    return (
        hll_projection(triples)
        .groupBy("pred", "bucket")
        .agg(F.max("rho").cast("long").alias("m"))
    )


def hll_projection(triples: DataFrame) -> DataFrame:
    """STATELESS narrow projection (pred, bucket, rho) feeding the HLL
    register max — shared by batch hll_build and the streaming register
    operator (works unchanged on a streaming DataFrame: pure row-local
    expressions). The fold hash is staged once, then SCRAMBLED before
    the bucket/rest split: the plain codepoint fold is too regular on
    sequential keys (the last characters dominate the low bits), which
    starves the geometric register tail; one squaring round (mid-square
    mixing, h^2 < 2^62 so exact in int64 in both engines) plus an affine
    step restores the uniformity HLL's estimator assumes."""
    staged = triples.select(
        "pred", fold_hash(F.col("obj")).alias("h0")
    ).select(
        "pred",
        (
            ((F.col("h0") * F.col("h0")) % F.lit(P31)) * F.lit(HLL_MIX_A)
            + F.col("h0")
        )
        % F.lit(P31),
    ).toDF("pred", "h")
    return staged.select(
        "pred",
        F.pmod(F.col("h"), F.lit(HLL_M)).alias("bucket"),
        F.expr(f"h DIV {HLL_M}").alias("rest"),
    ).withColumn("rho", _hll_rho(F.col("rest"))).drop("rest")


def hll_distinct(triples: DataFrame) -> DataFrame:
    """Exact-vs-HLL distinct object counts per predicate: (pred, n_exact,
    hll_est, zero_registers), ordered by pred. The estimator is the raw
    HLL harmonic mean in EXACT integer arithmetic — sum over the 64
    registers of 2^(26-m) (absent registers contribute m=0 => 2^26) is an
    exact bigint, and the estimate is one 64-bit division
    HLL_EST_NUM DIV sumpow scaled back from micro-units — so the DuckDB
    oracle replays every row bit-for-bit even though the ESTIMATE is
    approximate (relative error ~1.04/sqrt(64) = 13%). The small-range
    linear-counting correction (m*ln(m/V) when the raw estimate is below
    2.5m and V>0) needs an IEEE log whose cross-engine equality is not
    guaranteed, so it is NOT applied here; zero_registers (V) is emitted
    so a consumer can apply it driver-side. n_exact exists only to
    ground the gate — at 10^12 rows a consumer keeps just the registers."""
    from gliner_spark.cache import forward_caches

    regs = hll_build(triples)
    est = (
        regs.withColumn("pw", _hll_pow2(F.col("m")))
        .groupBy("pred")
        .agg(
            F.sum("pw").alias("present_sum"),
            F.count(F.lit(1)).alias("nregs"),
        )
        .select(
            "pred",
            (F.lit(HLL_M) - F.col("nregs")).cast("long")
            .alias("zero_registers"),
            (
                F.col("present_sum")
                + (F.lit(HLL_M) - F.col("nregs"))
                * F.lit(1 << (HLL_REST_BITS + 1))
            ).alias("sumpow"),
        )
        .select(
            "pred",
            "zero_registers",
            F.expr(f"({HLL_EST_NUM} DIV sumpow) DIV 1000000")
            .cast("long")
            .alias("hll_est"),
        )
    )
    exact = triples.groupBy("pred").agg(
        F.countDistinct("obj").cast("long").alias("n_exact")
    )
    out = (
        exact.join(est, "pred")
        .select("pred", "n_exact", "hll_est", "zero_registers")
        .orderBy("pred")
    )
    return forward_caches(out, triples)
