"""Adjacency-layer variants for entity-pair pruning.

Reference: gliner/modeling/multitask/relations_layers.py:45-406 — decoders
that map a doc's entity vectors X (E, D) to a soft adjacency matrix (E, E):
  dot        sigmoid(X Xᵀ)                      (:365-370, core/heads.py)
  mlp        sigmoid(MLP([x_i ‖ x_j]))          (:73-108)
  bilinear   sigmoid(Z Zᵀ), Z = XW              (:150-183)
  attn       mean-head attention weights        (:111-147)
  gcn        dot A₀ -> GCN refine -> sigmoid(ZZᵀ) (:186-269)
  gat        attention refine -> sigmoid(ZZᵀ)   (:272-312)

Numpy inference math, per-doc (no batch dim — Spark's Arrow batch is the
batch). Weights are seeded arrays (npz-loadable, DenseCheckpoint pattern);
single-head attention keeps the q/k/v/out projection structure of
nn.MultiheadAttention with dropout = identity.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from gliner_spark.core.decode import sigmoid


def _relu(x):
    return np.maximum(x, 0.0)


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def adjacency_weights(mode: str, dim: int, hidden: int = None, seed: int = 0) -> Dict[str, np.ndarray]:
    """Seeded per-mode weights (shape-compatible with a trained export)."""
    hidden = hidden or dim
    rng = np.random.default_rng(seed)
    s = 1.0 / np.sqrt(dim)

    def m(*shape):
        return rng.normal(0, s, shape)

    if mode == "dot":
        return {}
    if mode == "mlp":
        return {"w1": m(2 * dim, hidden), "b1": np.zeros(hidden),
                "w2": m(hidden, 1), "b2": np.zeros(1)}
    if mode == "bilinear":
        return {"wp": m(dim, hidden), "bp": np.zeros(hidden)}
    if mode in ("attn", "gat"):
        w = {"wq": m(dim, dim), "wk": m(dim, dim), "wv": m(dim, dim),
             "wo": m(dim, dim)}
        if mode == "gat":
            w["wl"], w["bl"] = m(dim, hidden), np.zeros(hidden)
        return w
    if mode == "gcn":
        return {"wg": m(dim, hidden), "bg": np.zeros(hidden),
                "wp": m(hidden, hidden), "bp": np.zeros(hidden)}
    raise ValueError(f"unknown adjacency mode {mode!r}")


def _attention_weights(x: np.ndarray, w: Dict[str, np.ndarray]) -> np.ndarray:
    """(E, E) single-head scaled dot-product attention weights."""
    q, k = x @ w["wq"], x @ w["wk"]
    return _softmax(q @ k.T / np.sqrt(x.shape[1]))


def adjacency(mode: str, x: np.ndarray, w: Dict[str, np.ndarray]) -> np.ndarray:
    """(E, E) soft adjacency over a doc's entity vectors x (E, D)."""
    e, d = x.shape
    if mode == "dot":  # :365-370
        return sigmoid(x @ x.T)
    if mode == "mlp":  # :73-108
        xi = np.repeat(x[:, None, :], e, axis=1)
        xj = np.repeat(x[None, :, :], e, axis=0)
        cat = np.concatenate([xi, xj], axis=-1)
        return sigmoid((_relu(cat @ w["w1"] + w["b1"]) @ w["w2"] + w["b2"])[..., 0])
    if mode == "bilinear":  # :150-183
        z = x @ w["wp"] + w["bp"]
        return sigmoid(z @ z.T)
    if mode == "attn":  # :111-147
        return _attention_weights(x, w)
    if mode == "gcn":  # :186-269
        a0 = sigmoid(x @ x.T) + np.eye(e)  # dot adjacency + self loops
        d_is = 1.0 / np.sqrt(a0.sum(axis=1))
        a_norm = a0 * d_is[:, None] * d_is[None, :]
        h = _relu((a_norm @ x) @ w["wg"] + w["bg"])
        z = h @ w["wp"] + w["bp"]
        return sigmoid(z @ z.T)
    if mode == "gat":  # :272-312
        attn = _attention_weights(x, w)
        h = (attn @ (x @ w["wv"])) @ w["wo"]
        z = h @ w["wl"] + w["bl"]
        return sigmoid(z @ z.T)
    raise ValueError(f"unknown adjacency mode {mode!r}")


ADJACENCY_MODES = ["dot", "mlp", "bilinear", "attn", "gcn", "gat"]
