"""Numpy scoring heads mirroring the reference's model math.

- span_marker_v0: reference gliner/modeling/span_rep.py:464-511 (SpanMarkerV0,
  the default span_mode, config.py:22): span_rep = out_proj(relu(cat(
  start_proj(h)[start], end_proj(h)[end]))).
- score head: reference gliner/modeling/base.py:474 —
  einsum("BLKD,BCD->BLKC", span_rep, prompts_embedding). Per document this is
  a plain (S, D) @ (D, C) matmul; the batch dimension is Spark's Arrow batch.
- DistMult: reference gliner/modeling/multitask/triples_layers.py:234-238 —
  score(h, r, t) = sum_d h_d * r_d * t_d.
- dot adjacency: reference gliner/modeling/multitask (relations_layers dot
  mode) — sigmoid(X @ X^T) over the per-doc entity set.

Weights here are plain numpy arrays (broadcast to executors); a trained
checkpoint can be loaded into the same structures (npz), keeping the math
identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gliner_spark.core.decode import sigmoid


@dataclass
class MarkerV0Weights:
    w_start: np.ndarray  # (D, D)
    w_end: np.ndarray    # (D, D)
    w_out: np.ndarray    # (2D, D)
    b_out: np.ndarray    # (D,)

    @staticmethod
    def random(dim: int, seed: int = 0) -> "MarkerV0Weights":
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(dim)
        return MarkerV0Weights(
            w_start=rng.normal(0, s, (dim, dim)).astype(np.float32),
            w_end=rng.normal(0, s, (dim, dim)).astype(np.float32),
            w_out=rng.normal(0, s, (2 * dim, dim)).astype(np.float32),
            b_out=np.zeros(dim, dtype=np.float32),
        )


def span_marker_v0(h: np.ndarray, span_idx: np.ndarray, w: MarkerV0Weights) -> np.ndarray:
    """Span representations for one document.

    h: (L, D) token representations; span_idx: (S, 2) inclusive word spans
    (clipped to valid range by caller). Returns (S, D).
    """
    start_rep = h @ w.w_start
    end_rep = h @ w.w_end
    s = np.clip(span_idx[:, 0], 0, h.shape[0] - 1)
    e = np.clip(span_idx[:, 1], 0, h.shape[0] - 1)
    cat = np.concatenate([start_rep[s], end_rep[e]], axis=1)
    np.maximum(cat, 0.0, out=cat)
    return cat @ w.w_out + w.b_out


def score_spans(span_rep: np.ndarray, label_matrix: np.ndarray,
                scale: float = 1.0, bias: float = 0.0) -> np.ndarray:
    """Per-doc slice of einsum("BLKD,BCD->BLKC"): (S,D)@(D,C) → probs (S,C)."""
    logits = (span_rep @ label_matrix.T - bias) * scale
    return sigmoid(logits)


def distmult(h: np.ndarray, r: np.ndarray, t: np.ndarray) -> np.ndarray:
    """DistMult interaction (triples_layers.py:234-238). Broadcasting-safe."""
    return (h * r * t).sum(axis=-1)


# ---- KG interaction library (reference triples_layers.py:24-554) ----------
# The parameter-free interactions, ported exactly; learned-projection
# variants (TransH/TransF/PairRE/TripleRE/ER-MLP/ConvKB/ConvE/TuckER) need
# trained weights and plug in through the same (h, r, t) seam once exported
# (the DenseCheckpoint pattern, core/dense.py).

_CLAMP = 10.0  # NormBasedInteraction clamp_norm default (:28-33)


def _norm_score(x: np.ndarray, p: int = 2, power: float = 1.0) -> np.ndarray:
    """-clamp(‖x‖_p^power, 10) — NormBasedInteraction._score (:59-76)."""
    d = np.linalg.norm(x, ord=p, axis=-1) ** power
    return -np.minimum(d, _CLAMP)


def um(h, r, t):
    """Unstructured model ‖h - t‖ (:77-84)."""
    return _norm_score(h - t)


def se(h, r, t):
    """Structure embedding: diag(r)h - diag(r)t (:87-101)."""
    return _norm_score(r * h - r * t)


def transe(h, r, t):
    """TransE ‖h + r - t‖_1 (:104-111, default p=1)."""
    return _norm_score(h + r - t, p=1)


def simple_interaction(h, r, t):
    """SimplE: ½(⟨h_f, r_f, t_b⟩ + ⟨t_f, r_b, h_b⟩) (:241-259)."""
    h_f, h_b = np.split(h, 2, axis=-1)
    t_f, t_b = np.split(t, 2, axis=-1)
    r_f, r_b = np.split(r, 2, axis=-1)
    return 0.5 * ((h_f * r_f * t_b).sum(-1) + (t_f * r_b * h_b).sum(-1))


def distma(h, r, t):
    """DistMA: ⟨h,r⟩ + ⟨h,t⟩ + ⟨r,t⟩ (:317-321)."""
    return (h * r).sum(-1) + (h * t).sum(-1) + (r * t).sum(-1)


def complex_interaction(h, r, t):
    """ComplEx: Re(⟨h, r, conj(t)⟩) (:324-339)."""
    h_re, h_im = np.split(h, 2, axis=-1)
    r_re, r_im = np.split(r, 2, axis=-1)
    t_re, t_im = np.split(t, 2, axis=-1)
    return (
        h_re * r_re * t_re + h_re * r_im * t_im
        + h_im * r_re * t_im - h_im * r_im * t_re
    ).sum(-1)


def quate(h, r, t):
    """QuatE Hamilton product (:342-362)."""
    h0, h1, h2, h3 = np.split(h, 4, axis=-1)
    r0, r1, r2, r3 = np.split(r, 4, axis=-1)
    t0, t1, t2, t3 = np.split(t, 4, axis=-1)
    a0 = h0 * r0 - h1 * r1 - h2 * r2 - h3 * r3
    a1 = h0 * r1 + h1 * r0 + h2 * r3 - h3 * r2
    a2 = h0 * r2 - h1 * r3 + h2 * r0 + h3 * r1
    a3 = h0 * r3 + h1 * r2 - h2 * r1 + h3 * r0
    return (a0 * t0 + a1 * t1 + a2 * t2 + a3 * t3).sum(-1)


def hole(h, r, t):
    """HolE circular correlation ϕ(h, t)·r via FFT (:365-378)."""
    fft_h = np.fft.rfft(h, axis=-1)
    fft_t = np.fft.rfft(t, axis=-1)
    corr = np.fft.irfft(np.conj(fft_h) * fft_t, n=h.shape[-1], axis=-1)
    return (corr * r).sum(-1)


def rotate(h, r, t):
    """RotatE: -Σ_i |h_i·r̂_i - t_i| with unit-modulus complex rotations
    (pipeline-native; the reference factory lacks it — standard form from
    the RotatE paper, complex split like ComplEx)."""
    h_re, h_im = np.split(h, 2, axis=-1)
    r_re, r_im = np.split(r, 2, axis=-1)
    t_re, t_im = np.split(t, 2, axis=-1)
    mod = np.sqrt(r_re**2 + r_im**2)
    hr_re = (h_re * r_re - h_im * r_im) / mod
    hr_im = (h_re * r_im + h_im * r_re) / mod
    return -np.sqrt((hr_re - t_re) ** 2 + (hr_im - t_im) ** 2).sum(-1)


# ---- learned-parameter interactions (weights dict, dropout/bn = identity
# at inference; a trained export loads into the same arrays) ---------------


def _l2norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def transh(h, r, t, w):
    """TransH hyperplane projection (:114-141)."""
    r_tr = r @ w["wtr"] + w["btr"]
    n = _l2norm(r @ w["ww"] + w["bw"])

    def proj(x):
        return x - (x * n).sum(-1, keepdims=True) * n

    return _norm_score(proj(h) + r_tr - proj(t))


def transf(h, r, t, w):
    """TransF relation-specific scaling + translation (:144-183)."""
    r_vec = r @ w["wr"] + w["br"]
    alpha = r @ w["wa"] + w["ba"]
    beta = r @ w["wb"] + w["bb"]
    return _norm_score(alpha * h + r_vec - beta * t)


def pairre(h, r, t, w):
    """PairRE per-relation elementwise scaling (:186-203)."""
    alpha = r @ w["wa"] + w["ba"]
    beta = r @ w["wb"] + w["bb"]
    return _norm_score(alpha * h - beta * t)


def triplere(h, r, t, w):
    """TripleRE = LineaRE + scalar gamma per relation (:206-231)."""
    alpha = r @ w["wa"] + w["ba"]
    beta = r @ w["wb"] + w["bb"]
    delta = r @ w["wd"] + w["bd"]
    gamma = (r @ w["wg"] + w["bg"])[..., 0]
    return gamma * _norm_score(alpha * h + delta - beta * t)


def tucker(h, r, t, w):
    """TuckER core-tensor interaction (:262-314; bn/dropout = identity)."""
    w_mat = np.einsum("...r,rde->...de", r, w["core"])
    hr = np.einsum("...d,...de->...e", h, w_mat)
    return (hr * t).sum(-1)


def ermlp(h, r, t, w):
    """ER-MLP on [h ‖ r ‖ t] (:381-390)."""
    x = np.concatenate([h, r, t], axis=-1)
    return (np.maximum(x @ w["w1"] + w["b1"], 0.0) @ w["w2"] + w["b2"])[..., 0]


def convkb(h, r, t, w):
    """ConvKB: kernel-1 Conv1d over the [h, r, t] channel axis -> relu ->
    flatten -> linear score (:393-459)."""
    stacked = np.stack([h, r, t], axis=-2)           # (..., 3, D)
    fm = np.einsum("fc,...cd->...fd", w["conv"], stacked) + w["bconv"][..., :, None]
    fm = np.maximum(fm, 0.0)
    flat = fm.reshape(*fm.shape[:-2], -1)            # (..., nf*D)
    return (flat @ w["fc"] + w["bfc"])[..., 0]


def conve(h, r, t, w):
    """ConvE: stack h/r as a 2D image, conv2d, fc, relu, dot with t
    (:461-555; dropouts = identity)."""
    d = h.shape[-1]
    e1, ks = w["emb_dim1"], w["kernel"]
    e2 = d // e1
    lead = h.shape[:-1]
    hf = h.reshape(-1, 1, e1, e2)
    rf = r.reshape(-1, 1, e1, e2)
    img = np.concatenate([hf, rf], axis=2)           # (B, 1, 2*e1, e2)
    oh, ow = 2 * e1 - ks + 1, e2 - ks + 1
    cw, cb = w["conv"], w["bconv"]                   # (nf, 1, ks, ks), (nf,)
    b = img.shape[0]
    out = np.zeros((b, cw.shape[0], oh, ow))
    for di in range(ks):
        for dj in range(ks):
            patch = img[:, 0, di : di + oh, dj : dj + ow]   # (B, oh, ow)
            out += cw[None, :, 0, di, dj, None, None] * patch[:, None]
    out = np.maximum(out + cb[None, :, None, None], 0.0)
    x = np.maximum(out.reshape(b, -1) @ w["fc"] + w["bfc"], 0.0)  # (B, D)
    return (x * t.reshape(-1, d)).sum(-1).reshape(lead)


KG_INTERACTIONS = {
    "distmult": distmult,
    "um": um,
    "se": se,
    "transe": transe,
    "simple": simple_interaction,
    "distma": distma,
    "complex": complex_interaction,
    "quate": quate,
    "hole": hole,
    "rotate": rotate,
}

KG_INTERACTIONS_LEARNED = {
    "transh": transh,
    "transf": transf,
    "pairre": pairre,
    "triplere": triplere,
    "tucker": tucker,
    "ermlp": ermlp,
    "convkb": convkb,
    "conve": conve,
}


def kg_interaction_weights(
    name: str, dim: int, seed: int = 0, n_filters: int = 8,
    emb_dim1: int = 2, kernel: int = 3, hidden: int = None,
):
    """Seeded weights for the learned-parameter interactions (shape-
    compatible with a trained export; DenseCheckpoint npz pattern)."""
    rng = np.random.default_rng(seed)
    s = 1.0 / np.sqrt(dim)

    def m(*shape):
        return rng.normal(0, s, shape)

    if name == "transh":
        return {"wtr": m(dim, dim), "btr": np.zeros(dim),
                "ww": m(dim, dim), "bw": np.zeros(dim)}
    if name in ("transf", "pairre", "triplere"):
        w = {"wa": m(dim, dim), "ba": np.ones(dim),
             "wb": m(dim, dim), "bb": np.ones(dim)}
        if name == "transf":
            w["wr"], w["br"] = m(dim, dim), np.zeros(dim)
        if name == "triplere":
            w["wd"], w["bd"] = m(dim, dim), np.zeros(dim)
            w["wg"], w["bg"] = m(dim, 1), np.ones(1)
        return w
    if name == "tucker":
        return {"core": m(dim, dim, dim)}
    if name == "ermlp":
        hd = hidden or 4 * dim
        return {"w1": m(3 * dim, hd), "b1": np.zeros(hd),
                "w2": m(hd, 1), "b2": np.zeros(1)}
    if name == "convkb":
        return {"conv": m(n_filters, 3), "bconv": np.zeros(n_filters),
                "fc": m(n_filters * dim, 1), "bfc": np.zeros(1)}
    if name == "conve":
        e2 = dim // emb_dim1
        oh, ow = 2 * emb_dim1 - kernel + 1, e2 - kernel + 1
        assert oh > 0 and ow > 0, "kernel too large for the embedding image"
        return {"conv": m(n_filters, 1, kernel, kernel),
                "bconv": np.zeros(n_filters),
                "fc": m(n_filters * oh * ow, dim), "bfc": np.zeros(dim),
                "emb_dim1": emb_dim1, "kernel": kernel}
    raise ValueError(f"no weights needed/known for {name!r}")


def kg_interaction(name: str, dim: int = None, seed: int = 0):
    """Factory (reference TriplesScoreLayer factory, :557-647). Returns a
    callable (h, r, t) -> scores; learned-parameter modes get seeded
    weights bound (pass dim), parameter-free modes are returned directly."""
    if name in KG_INTERACTIONS:
        return KG_INTERACTIONS[name]
    if name in KG_INTERACTIONS_LEARNED:
        if dim is None:
            raise ValueError(f"{name!r} needs dim= to build weights")
        w = kg_interaction_weights(name, dim, seed=seed)
        fn = KG_INTERACTIONS_LEARNED[name]
        return lambda h, r, t: fn(h, r, t, w)
    raise ValueError(
        f"unknown KG interaction {name!r}; available: "
        f"{sorted(KG_INTERACTIONS) + sorted(KG_INTERACTIONS_LEARNED)}"
    )


def dot_adjacency(x: np.ndarray) -> np.ndarray:
    """sigmoid(X @ X^T) over a doc's entity vectors (E, D) → (E, E)."""
    return sigmoid(x @ x.T)
