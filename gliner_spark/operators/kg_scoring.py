"""KG triple re-scoring with interaction functions as PURE JVM column
expressions (no Python in the hot path).

Reference: gliner/modeling/multitask/triples_layers.py:24-647 — the KG
interaction library behind the (h, r, t) seam. The numpy ports live in
core/heads.py (unit-tested against hand values); this module expresses the
same math over array<double> embedding COLUMNS with element_at/transform/
aggregate, so scoring a trillion triples is one narrow projection inside
whole-stage codegen — no UDF, no shuffle.

Determinism contract: every sum is an ORDERED left fold (F.aggregate here,
list_reduce in the DuckDB oracle), so even IEEE-inexact interactions
(rotate's division/sqrt) produce bit-identical results across engines.
Embeddings are deterministic functions of the node/relation NAME (codepoint
fold -> per-dim affine hash -> dyadic rational), standing in for trained KG
embeddings the same way DenseCheckpoint stands in for the trained encoder —
a real embedding table joins in by name through the same seam.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gliner_spark.functions.text import P31, fold_hash

_CLAMP = 10.0  # NormBasedInteraction clamp_norm default


def hash_embedding(col, dim: int) -> Column:
    """array<double>(dim): component j = ((fold(name)*(2j+5)+j) % P31 % 256
    * 2 - 255) / 256 — dyadic rationals, exactly reproducible in SQL."""
    c = F.col(col) if isinstance(col, str) else col
    base = fold_hash(c)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (((base * (j * 2 + 5) + j) % F.lit(P31)) % 256) * 2 - 255
        ).cast("double")
        / F.lit(256.0),
    )


def _fold_sum(terms: Column) -> Column:
    return F.aggregate(terms, F.lit(0.0), lambda a, x: a + x)


def _e(c: Column, i) -> Column:
    return F.element_at(c, i)


def interaction_expr(name: str, h: Column, r: Column, t: Column, dim: int) -> Column:
    """Score column for one interaction over (h, r, t) array<double> cols."""
    d2 = dim // 2
    idx = F.sequence(F.lit(1), F.lit(dim))
    idx2 = F.sequence(F.lit(1), F.lit(d2))

    if name == "distmult":  # triples_layers.py:234-238
        return _fold_sum(F.transform(idx, lambda i: _e(h, i) * _e(r, i) * _e(t, i)))

    if name == "distma":  # :317-321
        return _fold_sum(
            F.transform(
                idx,
                lambda i: _e(h, i) * _e(r, i)
                + _e(h, i) * _e(t, i)
                + _e(r, i) * _e(t, i),
            )
        )

    if name == "complex":  # :324-339
        return _fold_sum(
            F.transform(
                idx2,
                lambda i: _e(h, i) * _e(r, i) * _e(t, i)
                + _e(h, i) * _e(r, i + d2) * _e(t, i + d2)
                + _e(h, i + d2) * _e(r, i) * _e(t, i + d2)
                - _e(h, i + d2) * _e(r, i + d2) * _e(t, i),
            )
        )

    if name == "simple":  # :241-259
        s1 = _fold_sum(
            F.transform(idx2, lambda i: _e(h, i) * _e(r, i) * _e(t, i + d2))
        )
        s2 = _fold_sum(
            F.transform(idx2, lambda i: _e(t, i) * _e(r, i + d2) * _e(h, i + d2))
        )
        return F.lit(0.5) * (s1 + s2)

    if name == "transe":  # :104-111 (p=1, clamp 10)
        s = _fold_sum(F.transform(idx, lambda i: F.abs(_e(h, i) + _e(r, i) - _e(t, i))))
        return -F.least(s, F.lit(_CLAMP))

    if name == "um":  # :77-84 (p=2, clamp 10)
        s = _fold_sum(
            F.transform(idx, lambda i: (_e(h, i) - _e(t, i)) * (_e(h, i) - _e(t, i)))
        )
        return -F.least(F.sqrt(s), F.lit(_CLAMP))

    if name == "se":  # :87-101 (p=2, clamp 10)
        s = _fold_sum(
            F.transform(
                idx,
                lambda i: (_e(r, i) * (_e(h, i) - _e(t, i)))
                * (_e(r, i) * (_e(h, i) - _e(t, i))),
            )
        )
        return -F.least(F.sqrt(s), F.lit(_CLAMP))

    if name == "rotate":  # pipeline-native (see core/heads.rotate)
        def term(i):
            r_re, r_im = _e(r, i), _e(r, i + d2)
            h_re, h_im = _e(h, i), _e(h, i + d2)
            mod = F.sqrt(r_re * r_re + r_im * r_im)
            hr_re = (h_re * r_re - h_im * r_im) / mod
            hr_im = (h_re * r_im + h_im * r_re) / mod
            dre, dim_ = hr_re - _e(t, i), hr_im - _e(t, i + d2)
            return F.sqrt(dre * dre + dim_ * dim_)

        return -_fold_sum(F.transform(idx2, term))

    raise ValueError(f"no column-expression form for interaction {name!r}")


def score_triples(
    triples: DataFrame,
    interactions=None,
    dim: int = None,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    cfg=None,
) -> DataFrame:
    """Add score_{name} columns re-scoring each (subj, pred, obj) triple
    under the requested interaction functions (defaults to the pipeline's
    configured kg_interaction). One narrow projection."""
    if interactions is None:
        interactions = (cfg.kg_interaction,) if cfg else ("distmult",)
    if dim is None:
        dim = cfg.kg_embed_dim if cfg else 8
    out = (
        triples.withColumn("_h", hash_embedding(subj_col, dim))
        .withColumn("_r", hash_embedding(pred_col, dim))
        .withColumn("_t", hash_embedding(obj_col, dim))
    )
    for name in interactions:
        out = out.withColumn(
            f"score_{name}",
            interaction_expr(name, F.col("_h"), F.col("_r"), F.col("_t"), dim),
        )
    return out.drop("_h", "_r", "_t")
