"""KG interaction library: hand-computed values (reference
triples_layers.py:24-554 semantics) + Spark-column-expression parity with
the numpy ports."""

import numpy as np
import pytest

from gliner_spark.core.heads import (
    KG_INTERACTIONS,
    complex_interaction,
    distma,
    distmult,
    hole,
    kg_interaction,
    quate,
    rotate,
    se,
    simple_interaction,
    transe,
    um,
)

H = np.array([1.0, 2.0, -1.0, 0.5])
R = np.array([0.5, -1.0, 2.0, 1.0])
T = np.array([2.0, 1.0, 0.0, -2.0])


def test_hand_values():
    assert distmult(H, R, T) == pytest.approx(1 * 0.5 * 2 + 2 * -1 * 1 + 0 + 0.5 * 1 * -2)
    assert distma(H, R, T) == pytest.approx(
        (H * R).sum() + (H * T).sum() + (R * T).sum()
    )
    # TransE: -min(||h + r - t||_1, 10)
    assert transe(H, R, T) == pytest.approx(-min(np.abs(H + R - T).sum(), 10.0))
    # UM: -min(||h - t||_2, 10)
    assert um(H, R, T) == pytest.approx(-min(np.linalg.norm(H - T), 10.0))
    assert se(H, R, T) == pytest.approx(-min(np.linalg.norm(R * (H - T)), 10.0))
    # ComplEx with split halves [re | im]
    h_re, h_im = H[:2], H[2:]
    r_re, r_im = R[:2], R[2:]
    t_re, t_im = T[:2], T[2:]
    assert complex_interaction(H, R, T) == pytest.approx(
        (h_re * r_re * t_re + h_re * r_im * t_im
         + h_im * r_re * t_im - h_im * r_im * t_re).sum()
    )
    # SimplE
    assert simple_interaction(H, R, T) == pytest.approx(
        0.5 * ((h_re * r_re * t_im).sum() + (t_re * r_im * h_im).sum())
    )
    # QuatE on dim 4: Hamilton product scalar parts
    q = quate(H, R, T)
    a0 = H[0] * R[0] - H[1] * R[1] - H[2] * R[2] - H[3] * R[3]
    a1 = H[0] * R[1] + H[1] * R[0] + H[2] * R[3] - H[3] * R[2]
    a2 = H[0] * R[2] - H[1] * R[3] + H[2] * R[0] + H[3] * R[1]
    a3 = H[0] * R[3] + H[1] * R[2] - H[2] * R[1] + H[3] * R[0]
    assert q == pytest.approx(a0 * T[0] + a1 * T[1] + a2 * T[2] + a3 * T[3])
    # HolE: circular correlation, spot-checked against the direct O(D^2) form
    corr = np.array(
        [sum(H[k] * T[(k + i) % 4] for k in range(4)) for i in range(4)]
    )
    assert hole(H, R, T) == pytest.approx((corr * R).sum())
    # RotatE: unit-modulus rotation distance
    mod = np.sqrt(r_re**2 + r_im**2)
    hr_re = (h_re * r_re - h_im * r_im) / mod
    hr_im = (h_re * r_im + h_im * r_re) / mod
    want = -np.sqrt((hr_re - t_re) ** 2 + (hr_im - t_im) ** 2).sum()
    assert rotate(H, R, T) == pytest.approx(want)


def test_factory():
    assert kg_interaction("complex") is complex_interaction
    with pytest.raises(ValueError, match="unknown KG interaction"):
        kg_interaction("nope")
    assert len(KG_INTERACTIONS) == 10


def test_learned_interactions_shapes_and_determinism():
    from gliner_spark.core.heads import KG_INTERACTIONS_LEARNED

    h = np.random.default_rng(0).normal(size=(5, 8))
    r = np.random.default_rng(1).normal(size=(5, 8))
    t = np.random.default_rng(2).normal(size=(5, 8))
    assert len(KG_INTERACTIONS_LEARNED) == 8
    for name in KG_INTERACTIONS_LEARNED:
        fn = kg_interaction(name, dim=8, seed=3)
        out = fn(h, r, t)
        assert out.shape == (5,), name
        assert np.array_equal(out, kg_interaction(name, dim=8, seed=3)(h, r, t))
        assert np.isfinite(out).all(), name


def test_transh_hyperplane_invariance():
    """Adding any multiple of the relation hyperplane normal to h must not
    change the TransH score (the projection removes it) — :128-141."""
    from gliner_spark.core.heads import kg_interaction_weights, transh

    w = kg_interaction_weights("transh", 8, seed=4)
    h = np.array([1.0, -2.0, 0.5, 3.0, 0.0, 1.0, -1.0, 2.0])
    r = np.array([0.3, 1.0, -0.7, 0.2, 0.9, -0.4, 0.1, 0.6])
    t = np.array([2.0, 0.1, -1.0, 0.4, -0.3, 0.8, 1.2, -0.5])
    n = r @ w["ww"] + w["bw"]
    n = n / np.linalg.norm(n)
    assert transh(h, r, t, w) == pytest.approx(transh(h + 3.7 * n, r, t, w))


def test_tucker_core_contraction_hand_math():
    from gliner_spark.core.heads import kg_interaction_weights, tucker

    d = 4
    w = {"core": np.random.default_rng(6).normal(size=(d, d, d))}
    h = np.arange(d, dtype=float)
    r = np.ones(d)
    t = np.linspace(-1, 1, d)
    want = 0.0
    for rr in range(d):
        for dd in range(d):
            for ee in range(d):
                want += r[rr] * w["core"][rr, dd, ee] * h[dd] * t[ee]
    assert tucker(h, r, t, w) == pytest.approx(want)


def test_conve_matches_naive_conv():
    from gliner_spark.core.heads import conve, kg_interaction_weights

    d, e1, ks = 8, 2, 3
    w = kg_interaction_weights("conve", d, seed=7, emb_dim1=e1, kernel=ks)
    h = np.random.default_rng(8).normal(size=(d,))
    r = np.random.default_rng(9).normal(size=(d,))
    t = np.random.default_rng(10).normal(size=(d,))
    e2 = d // e1
    img = np.concatenate(
        [h.reshape(e1, e2), r.reshape(e1, e2)], axis=0
    )  # (2*e1, e2)
    oh, ow = 2 * e1 - ks + 1, e2 - ks + 1
    nf = w["conv"].shape[0]
    fm = np.zeros((nf, oh, ow))
    for f in range(nf):
        for i in range(oh):
            for j in range(ow):
                fm[f, i, j] = (
                    w["conv"][f, 0] * img[i : i + ks, j : j + ks]
                ).sum() + w["bconv"][f]
    x = np.maximum(np.maximum(fm, 0.0).ravel() @ w["fc"] + w["bfc"], 0.0)
    assert conve(h[None], r[None], t[None], w)[0] == pytest.approx((x * t).sum())


def test_batched_shapes():
    h = np.random.default_rng(0).normal(size=(5, 8))
    r = np.random.default_rng(1).normal(size=(5, 8))
    t = np.random.default_rng(2).normal(size=(5, 8))
    for name, fn in KG_INTERACTIONS.items():
        out = fn(h, r, t)
        assert out.shape == (5,), name


def test_spark_exprs_match_numpy(spark):
    """Column-expression interactions == numpy ports on the same hash
    embeddings (SQL-expressible subset)."""
    from pyspark.sql import functions as F

    from gliner_spark.operators.kg_scoring import hash_embedding, score_triples

    names = ["acme corp", "alice almeida", "lisbon", "works_at", "media://abc"]
    rows = [(a, b, c) for a in names[:3] for b in names[3:4] for c in names[1:4]]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    exprs = ["distmult", "complex", "simple", "distma", "transe", "um", "se", "rotate"]
    got = score_triples(df, interactions=exprs, dim=8).collect()

    emb = {
        r.name: np.array(r.e)
        for r in spark.createDataFrame([(n,) for n in names], "name string")
        .select("name", hash_embedding("name", 8).alias("e"))
        .collect()
    }
    for row in got:
        h, r, t = emb[row.subj], emb[row.pred], emb[row.obj]
        for name in exprs:
            fn = KG_INTERACTIONS[name if name != "simple" else "simple"]
            want = float(fn(h, r, t))
            assert getattr(row, f"score_{name}") == pytest.approx(
                want, abs=1e-12
            ), (row.subj, row.pred, row.obj, name)
