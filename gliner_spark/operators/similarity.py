"""Similarity search over an embedding column (array<float>).

Exact cross-engine determinism: embeddings are quantized to integers
(round(x * 10^4)) so dot products and squared norms are EXACT bigint
arithmetic in both Spark and the SQL oracle; only the final
sim = dot / sqrt(na * nb) touches floating point (single IEEE op chain,
bit-identical across engines).

- cosine_topk: brute-force top-k (the correctness baseline). The query set
  is broadcast; the scan side streams — at scale this is one pass over the
  corpus per query batch with a partial top-k per partition (Spark's window
  + AQE handle it; for >>1e9 rows use the IVF variant).
- ivf_topk: bucketed (IVF-style) variant — search only the query's cell
  (here: the pre-assigned `label` as the coarse centroid id), which is the
  100 TB path: the bucket join prunes the candidate set by ~nlist x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 10000


def _quantized(emb: DataFrame) -> DataFrame:
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * QUANT).cast("long")
    )
    return emb.select(
        "vec_id",
        "label",
        q.alias("q"),
    ).withColumn(
        "norm2",
        F.aggregate(
            F.zip_with("q", "q", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def _pair_sim(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cross-scored pairs with exact integer dot products."""
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("query_id") != F.col("vec_id"))
        .withColumn("dot", dot)
        .withColumn(
            "sim",
            F.col("dot").cast("double")
            / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
        )
    )


def cosine_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k of each query (vec_id < n_queries) vs all."""
    qz = _quantized(emb)
    queries = qz.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qa"),
        F.col("norm2").alias("na"),
    )
    corpus = qz.select("vec_id", F.col("q").alias("qb"), F.col("norm2").alias("nb"))
    scored = _pair_sim(F.broadcast(queries), corpus)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))
        .orderBy("query_id", "rank")
    )


def ivf_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """IVF-bucketed ANN: candidates restricted to the query's cell (label)."""
    qz = _quantized(emb)
    queries = qz.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("cell"),
        F.col("q").alias("qa"),
        F.col("norm2").alias("na"),
    )
    corpus = qz.select(
        "vec_id", F.col("label").alias("cell"),
        F.col("q").alias("qb"), F.col("norm2").alias("nb"),
    )
    joined = F.broadcast(queries).join(corpus, "cell").filter(
        F.col("query_id") != F.col("vec_id")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = joined.withColumn("dot", dot).withColumn(
        "sim",
        F.col("dot").cast("double")
        / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------- k-means IVF ----
K_CELLS = 8
KM_ITERS = 2
NPROBE = 2
KM_SAMPLE_TARGET = 128  # quantizer training-sample size (~16 vecs/cell)


def _centroid_update_exprs(dim: int):
    """Integer-rounded mean per dimension: round-half-away-from-zero in pure
    bigint arithmetic (DIV) — exact and engine-identical, so the SQL oracle
    reproduces the Lloyd update bit-for-bit (no IEEE division anywhere)."""
    return [
        F.expr(
            f"CASE WHEN s_{d} >= 0 THEN (2*s_{d} + n) DIV (2*n) "
            f"ELSE -((2*(-s_{d}) + n) DIV (2*n)) END"
        ).cast("long")
        for d in range(dim)
    ]


def _assign_struct(q_col, cents, nprobe: int = 1):
    """Array of the `nprobe` nearest (d2, cell) structs to broadcast-literal
    centroids — a pure narrow expression, no join, no shuffle."""
    structs = []
    for cell, vec in cents:
        carr = F.array(*[F.lit(int(v)).cast("long") for v in vec])
        d2 = F.aggregate(
            F.zip_with(q_col, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        structs.append(
            F.struct(d2.alias("d2"), F.lit(int(cell)).alias("cell"))
        )
    return F.slice(F.array_sort(F.array(*structs)), 1, nprobe)


def training_sample(qz: DataFrame, s: int) -> DataFrame:
    """Deterministic modulo sample for quantizer training: every s-th
    vec_id. The pmod filter is a narrow map-side predicate evaluated in
    PARALLEL across the corpus partitions; only the quantizer-sized sample
    then flows through the single-partition exchange (repartition(1) — an
    Exchange over ~KM_SAMPLE_TARGET rows, never the full corpus). Never use
    coalesce(1) here: coalesce collapses the UPSTREAM scan+filter into one
    task, which is exactly the full-corpus-in-one-task shape this avoids."""
    samp = qz.select("vec_id", "q")
    if s > 1:
        samp = samp.filter(F.pmod(F.col("vec_id"), F.lit(s)) == 0)
    return samp.repartition(1)


def train_kmeans_cells(
    qz: DataFrame,
    k: int = K_CELLS,
    iters: int = KM_ITERS,
    sample_target: int = KM_SAMPLE_TARGET,
) -> list:
    """Deterministic Lloyd k-means over a deterministic SAMPLE of the
    quantized vectors: sample = vec_id % s == 0 with s = ceil(n / target),
    init = the sample's first k vectors (vec_id < k*s), fixed iteration
    count, integer-rounded means, ties broken by cell id.
    Returns [(cell, centroid_ints)].

    Scale shape: training cost is FIXED (~sample_target rows) regardless of
    corpus size — the count() is a column-pruned metadata-cheap job, the
    modulo filter is narrow and parallel, and only the sample crosses the
    single-partition exchange. The learned centroids then ship inside
    closures as literals; assignment of the full corpus is a narrow
    projection. The SQL oracle takes the identical sample (same s formula),
    so the gate stays bit-exact."""
    n = qz.count()
    s = max(1, (n + sample_target - 1) // sample_target)
    samp = training_sample(qz, s).persist()
    dim = len(samp.select("q").first().q)
    cents = sorted(
        (int(r.vec_id), [int(x) for x in r.q])
        for r in samp.filter(F.col("vec_id") < k * s).collect()
    )  # sorted: collect() order is partitioning-dependent
    for _ in range(iters):
        assigned = samp.select(
            "q", _assign_struct(F.col("q"), cents)[0]["cell"].alias("cell")
        )
        sums = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("q", d + 1)).alias(f"s_{d}")
                for d in range(dim)
            ],
        )
        new = {
            int(r.cell): [int(x) for x in r.c]
            for r in sums.select(
                "cell", F.array(*_centroid_update_exprs(dim)).alias("c")
            ).collect()
        }
        # empty cells keep their previous centroid
        cents = [(cell, new.get(cell, vec)) for cell, vec in cents]
    samp.unpersist()
    return cents


def kmeans_ivf_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = K_CELLS,
    nprobe: int = NPROBE,
) -> DataFrame:
    """IVF with a LEARNED coarse quantizer: deterministic k-means centroids,
    corpus bucketed by nearest cell, queries probe their `nprobe` nearest
    cells. The 100 TB ANN path: candidate set pruned ~(n_cells/nprobe)x,
    assignment narrow, the only shuffles are the per-cell equi-join and the
    top-k window."""
    qz = _quantized(emb)
    cents = train_kmeans_cells(qz, k=n_cells)

    corpus = qz.select(
        "vec_id",
        _assign_struct(F.col("q"), cents)[0]["cell"].alias("cell"),
        F.col("q").alias("qb"),
        F.col("norm2").alias("nb"),
    )
    queries = (
        qz.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.transform(
                    _assign_struct(F.col("q"), cents, nprobe=nprobe),
                    lambda s: s["cell"],
                )
            ).alias("cell"),
            F.col("q").alias("qa"),
            F.col("norm2").alias("na"),
        )
    )
    joined = F.broadcast(queries).join(corpus, "cell").filter(
        F.col("query_id") != F.col("vec_id")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = joined.withColumn("dot", dot).withColumn(
        "sim",
        F.col("dot").cast("double")
        / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", F.round("sim", 6).alias("sim"))
        .orderBy("query_id", "rank")
    )


def embedding_neardup(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, blocked by cell (label):
    the embedding analog of LSH blocking — never an unblocked cross join."""
    qz = _quantized(emb)
    a = qz.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("cell"),
        F.col("q").alias("qa"), F.col("norm2").alias("na"),
    )
    b = qz.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("cell"),
        F.col("q").alias("qb"), F.col("norm2").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("dot", dot)
        .withColumn(
            "sim",
            F.col("dot").cast("double")
            / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
        )
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", F.round("sim", 6).alias("sim"))
        .orderBy("vec_a", "vec_b")
    )
