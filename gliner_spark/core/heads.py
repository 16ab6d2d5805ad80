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


def dot_adjacency(x: np.ndarray) -> np.ndarray:
    """sigmoid(X @ X^T) over a doc's entity vectors (E, D) → (E, E)."""
    return sigmoid(x @ x.T)
