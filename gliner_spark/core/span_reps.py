"""The 12 span-representation modes of the reference factory
(gliner/modeling/span_rep.py:686-759), as numpy inference math.

Every mode maps per-doc token reps h (L, D) to span reps (S, D) with
S = L * max_width in the reference's row-major (start, width) order —
the same order core/spans.enumerate_spans produces, so any mode drops into
the scoring seam (score = span_rep @ label_matrix.T) and therefore into the
Spark extraction UDF unchanged.

Weights are plain numpy arrays (npz-loadable like core/dense.DenseCheckpoint);
dropout layers are identity at inference. Reference line map:
  marker      span_rep.py:389-462   markerV0   :464-511 (core/heads.py)
  markerV1    :514-585              query      :8-56
  mlp         :58-102               cat        :104-155
  conv_conv/max/mean/sum :157-267   conv_share :312-366
  token_level :639-685              (ConvShareV2 :587-637 — bonus, no factory key)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from gliner_spark.core.heads import MarkerV0Weights, span_marker_v0


def _relu(x):
    return np.maximum(x, 0.0)


def _proj2(x, w1, b1, w2, b2):
    """create_projection_layer (layers.py:74-93): Linear -> ReLU ->
    [Dropout=id] -> Linear."""
    return _relu(x @ w1 + b1) @ w2 + b2


def _pad_right(h: np.ndarray, n: int) -> np.ndarray:
    """Zero-pad n rows at the sequence end (F.pad(..., (0, pad)))."""
    if n == 0:
        return h
    return np.concatenate([h, np.zeros((n, h.shape[1]), h.dtype)], axis=0)


def _windows(h: np.ndarray, k: int) -> np.ndarray:
    """(L, k, D) sliding windows over right-zero-padded h."""
    hp = _pad_right(h, k - 1)
    L, D = h.shape
    return np.stack([hp[i : i + L] for i in range(k)], axis=1)


def random_span_rep_weights(
    mode: str, dim: int, max_width: int, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Seeded weight init per mode (shape-compatible with a trained export)."""
    rng = np.random.default_rng(seed)
    s = 1.0 / np.sqrt(dim)

    def m(*shape):
        return rng.normal(0, s, shape)

    if mode == "markerV0":
        return {
            "w_start": m(dim, dim), "w_end": m(dim, dim),
            "w_out": m(2 * dim, dim), "b_out": np.zeros(dim),
        }
    if mode == "marker":
        return {
            "ws1": m(dim, 2 * dim), "bs1": np.zeros(2 * dim),
            "ws2": m(2 * dim, dim), "bs2": np.zeros(dim),
            "we1": m(dim, 2 * dim), "be1": np.zeros(2 * dim),
            "we2": m(2 * dim, dim), "be2": np.zeros(dim),
            "wo": m(2 * dim, dim), "bo": np.zeros(dim),
        }
    if mode in ("markerV1", "token_level"):
        w = {}
        parts = ["s", "e"] + (["f"] if mode == "markerV1" else [])
        for p in parts:
            w[f"w{p}1"], w[f"b{p}1"] = m(dim, 4 * dim), np.zeros(4 * dim)
            w[f"w{p}2"], w[f"b{p}2"] = m(4 * dim, dim), np.zeros(dim)
        cat_d = dim * (3 if mode == "markerV1" else 2)
        w["wo1"], w["bo1"] = m(cat_d, 4 * dim), np.zeros(4 * dim)
        w["wo2"], w["bo2"] = m(4 * dim, dim), np.zeros(dim)
        return w
    if mode == "query":
        return {
            "q": rng.uniform(-1, 1, (dim, max_width)),
            "w": m(dim, dim), "b": np.zeros(dim),
        }
    if mode == "mlp":
        return {"w": m(dim, dim * max_width), "b": np.zeros(dim * max_width)}
    if mode == "cat":
        return {
            "q": m(128, max_width),
            "w": m(dim + 128, dim), "b": np.zeros(dim),
        }
    if mode in ("conv_max", "conv_mean", "conv_sum"):
        return {"w": m(dim, dim), "b": np.zeros(dim)}
    if mode == "conv_conv":
        return {
            **{f"k{k}": m(dim, dim, k) for k in range(2, max_width + 1)},
            "w": m(dim, dim), "b": np.zeros(dim),
        }
    if mode == "conv_share":
        return {"cw": m(dim, dim, max_width), "w": m(dim, dim), "b": np.zeros(dim)}
    raise ValueError(f"unknown span mode {mode!r}")


def span_rep(
    mode: str,
    h: np.ndarray,
    span_idx: np.ndarray,
    max_width: int,
    w: Dict[str, np.ndarray],
) -> np.ndarray:
    """(S, D) span representations for one doc under the chosen mode."""
    L, D = h.shape
    K = max_width

    if mode == "markerV0":
        return span_marker_v0(
            h, span_idx,
            MarkerV0Weights(w["w_start"], w["w_end"], w["w_out"], w["b_out"]),
        )

    if mode == "marker":  # :389-462
        start_rep = _relu(h @ w["ws1"] + w["bs1"]) @ w["ws2"] + w["bs2"]
        end_rep = _relu(h @ w["we1"] + w["be1"]) @ w["we2"] + w["be2"]
        s = np.clip(span_idx[:, 0], 0, L - 1)
        e = np.clip(span_idx[:, 1], 0, L - 1)
        cat = _relu(np.concatenate([start_rep[s], end_rep[e]], axis=1))
        return cat @ w["wo"] + w["bo"]

    if mode in ("markerV1", "token_level"):  # :514-585 / :639-685
        start_rep = _proj2(h, w["ws1"], w["bs1"], w["ws2"], w["bs2"])
        end_rep = _proj2(h, w["we1"], w["be1"], w["we2"], w["be2"])
        s = np.clip(span_idx[:, 0], 0, L - 1)
        e = np.clip(span_idx[:, 1], 0, L - 1)
        parts = [start_rep[s], end_rep[e]]
        if mode == "markerV1":
            first = _proj2(h.mean(axis=0), w["wf1"], w["bf1"], w["wf2"], w["bf2"])
            parts.append(np.broadcast_to(first, (span_idx.shape[0], D)))
        cat = _relu(np.concatenate(parts, axis=1))
        return _proj2(cat, w["wo1"], w["bo1"], w["wo2"], w["bo2"])

    # the remaining modes are (L, K, D)-shaped by construction; flatten to
    # (S, D) in the same row-major (start, width) order as enumerate_spans
    if mode == "query":  # :8-56, einsum bld,ds->blsd then Linear+ReLU
        grid = h[:, None, :] * w["q"].T[None, :, :]  # (L, K, D)
        grid = _relu(grid @ w["w"] + w["b"])
    elif mode == "mlp":  # :58-102
        grid = _relu((h @ w["w"] + w["b"]).reshape(L, K, D))
    elif mode == "cat":  # :104-155
        q = np.broadcast_to(w["q"].T[None, :, :], (L, K, 128))
        hh = np.broadcast_to(h[:, None, :], (L, K, D))
        grid = _relu(np.concatenate([hh, q], axis=-1) @ w["w"] + w["b"])
    elif mode in ("conv_max", "conv_mean", "conv_sum", "conv_conv"):
        # :157-267 — span_reps = [x, block_2(x), ..., block_K(x)], then
        # project = ReLU -> Linear
        reps = [h]
        for k in range(2, K + 1):
            if mode == "conv_conv":
                cw = w[f"k{k}"]  # (D_out, D_in, k)
                win = _windows(h, k)  # (L, k, D_in)
                reps.append(np.einsum("lki,oik->lo", win, cw))
            elif mode == "conv_max":
                reps.append(_windows(h, k).max(axis=1))
            else:
                mean = _windows(h, k).mean(axis=1)
                reps.append(mean * k if mode == "conv_sum" else mean)
        grid = _relu(np.stack(reps, axis=1)) @ w["w"] + w["b"]
    elif mode == "conv_share":  # :312-366 — shared weight, width-i prefix
        reps = []
        for i in range(K):
            cw = w["cw"][:, :, : i + 1]  # (D_out, D_in, i+1)
            win = _windows(h, i + 1)
            reps.append(np.einsum("lki,oik->lo", win, cw))
        grid = _relu(np.stack(reps, axis=1)) @ w["w"] + w["b"]
    else:
        raise ValueError(f"unknown span mode {mode!r}")
    return grid.reshape(L * K, D)


SPAN_MODES = [
    "marker", "markerV0", "markerV1", "query", "mlp", "cat",
    "conv_conv", "conv_max", "conv_mean", "conv_sum", "conv_share",
    "token_level",
]
