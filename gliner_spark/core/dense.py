"""Runnable dense-encoder path with loadable npz weights.

This is the production-shaped counterpart of the deterministic gather model
(core/model.py): token representations come from a LEARNABLE hash-bucket
embedding table, span representations from the SpanMarkerV0 head
(core/heads.span_marker_v0 — reference gliner/modeling/span_rep.py:464-511),
label prompts from MEAN-POOLED token embeddings of the label strings
(reference's label-encoder mean pooling / prompt-embedding averaging,
gliner/modeling/base.py:83-121), and scores from the same matmul->sigmoid
head (base.py:474). Weights round-trip through a single .npz file — the
analog of the reference checkpoint save/load (gliner/model.py:639-691) —
and ship to executors via an explicit ``sc.broadcast`` (see
operators/extraction.extract_spans_dense).

A real trained GLiNER export drops into ``DenseCheckpoint`` unchanged in
shape: replace `emb` with the transformer's pooled word vectors upstream
(the only piece this container cannot run) and load the exported
SpanMarkerV0/prompt weights into the same arrays.

Oracle-exactness design: default weights are dyadic rationals (k/256,
k int8) and all matmuls accumulate in float64, so every intermediate value
is an exactly-representable dyadic rational — sums are order-independent
bit-exact, and the DuckDB oracle reproduces the whole forward pass
relationally (see __spark_entry__.kg_mentions_dense oracle).
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from gliner_spark.core.decode import sigmoid
from gliner_spark.core.heads import MarkerV0Weights, span_marker_v0
from gliner_spark.core.spans import enumerate_spans
from gliner_spark.core.tokenization import tokenize_with_offsets

P31 = 2147483647
FOLD_M = 1000003


from functools import lru_cache


@lru_cache(maxsize=65536)
def fold_hash_py(s: str) -> int:
    """Codepoint-fold hash — same arithmetic as functions/text.fold_hash
    (Spark) and the DuckDB list_reduce idiom, so all three engines agree.
    Memoized: the corpus vocabulary is bounded, so per-token calls are
    dominated by repeats (pure function — a cache changes nothing)."""
    h = 0
    for ch in s:
        h = (h * FOLD_M + ord(ch)) % P31
    return h


@dataclass
class DenseCheckpoint:
    """Loadable dense-model weights (all float64, dyadic by construction
    when produced by ``random_quantized``)."""

    emb: np.ndarray            # (V, D) hash-bucket token embedding table
    w_start: np.ndarray        # (D, D) SpanMarkerV0 start projection
    w_end: np.ndarray          # (D, D) SpanMarkerV0 end projection
    w_out: np.ndarray          # (2D, D) SpanMarkerV0 output projection
    b_out: np.ndarray          # (D,)
    labels: List[str]          # entity types, order = class id
    label_matrix: np.ndarray   # (C, D) mean-pooled label prompt embeddings
    scale: float               # logits = (dot - bias) * scale
    bias: float
    threshold: float
    max_width: int

    @property
    def dim(self) -> int:
        return self.emb.shape[1]

    @property
    def vocab_buckets(self) -> int:
        return self.emb.shape[0]

    def marker(self) -> MarkerV0Weights:
        return MarkerV0Weights(
            w_start=self.w_start, w_end=self.w_end,
            w_out=self.w_out, b_out=self.b_out,
        )

    # ----- checkpoint round-trip (reference model.py:639-691 analog) -----
    def save_npz(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(
            path,
            emb=self.emb, w_start=self.w_start, w_end=self.w_end,
            w_out=self.w_out, b_out=self.b_out,
            label_matrix=self.label_matrix,
            labels=np.array(self.labels, dtype=object),
            meta=np.array(
                [self.scale, self.bias, self.threshold, float(self.max_width)]
            ),
        )

    @staticmethod
    def load_npz(path_or_bytes) -> "DenseCheckpoint":
        if isinstance(path_or_bytes, (bytes, bytearray)):
            path_or_bytes = io.BytesIO(path_or_bytes)
        z = np.load(path_or_bytes, allow_pickle=True)
        meta = z["meta"]
        return DenseCheckpoint(
            emb=z["emb"], w_start=z["w_start"], w_end=z["w_end"],
            w_out=z["w_out"], b_out=z["b_out"],
            labels=[str(x) for x in z["labels"]],
            label_matrix=z["label_matrix"],
            scale=float(meta[0]), bias=float(meta[1]),
            threshold=float(meta[2]), max_width=int(meta[3]),
        )


# per-python-worker parsed-checkpoint cache for the SparkFiles path
_CKPT_CACHE: Dict[str, "DenseCheckpoint"] = {}


def load_checkpoint_sparkfile(name: str) -> "DenseCheckpoint":
    """Executor-side lazy npz load: resolve `name` via SparkFiles.get (the
    file was shipped once per executor by ``sc.addFile``) and cache the
    parsed checkpoint per python worker process.

    This is the production weight path for a real exported GLiNER
    checkpoint (reference model.py:639-691 from_pretrained): a broadcast
    re-pickles the arrays into the broadcast block store per session, while
    addFile ships the npz bytes to each executor's work dir exactly once
    and every worker process parses it locally on first use."""
    ck = _CKPT_CACHE.get(name)
    if ck is None:
        from pyspark import SparkFiles

        ck = DenseCheckpoint.load_npz(SparkFiles.get(name))
        _CKPT_CACHE[name] = ck
    return ck


def _dyadic(rng: np.random.Generator, shape) -> np.ndarray:
    """int8-quantized weights k/256 — every value exactly representable."""
    return rng.integers(-128, 128, size=shape).astype(np.float64) / 256.0


def mean_pool_labels(
    labels: Sequence[str], emb: np.ndarray
) -> np.ndarray:
    """(C, D) label prompt matrix = mean of the label text's token
    embeddings (reference label-encoder mean pooling, base.py:83-121)."""
    V = emb.shape[0]
    out = np.zeros((len(labels), emb.shape[1]), dtype=np.float64)
    for ci, lab in enumerate(labels):
        toks = lab.lower().split()
        vecs = [emb[fold_hash_py(t) % V] for t in toks] or [np.zeros(emb.shape[1])]
        out[ci] = np.mean(vecs, axis=0)
    return out


def random_quantized(
    labels: Sequence[str],
    dim: int = 8,
    vocab_buckets: int = 64,
    seed: int = 7,
    scale: float = 0.25,
    bias: float = 0.34375,  # dyadic (88/256): ~99.5th pct of the dot dist
    threshold: float = 0.5,
    max_width: int = 4,
) -> DenseCheckpoint:
    """Deterministic 'trained' checkpoint stand-in: dyadic random weights.
    The small default dim keeps the SQL oracle's relational matmuls cheap;
    a real export uses dim=768 with the identical code path."""
    rng = np.random.default_rng(seed)
    emb = _dyadic(rng, (vocab_buckets, dim))
    ckpt = DenseCheckpoint(
        emb=emb,
        w_start=_dyadic(rng, (dim, dim)),
        w_end=_dyadic(rng, (dim, dim)),
        w_out=_dyadic(rng, (2 * dim, dim)),
        b_out=_dyadic(rng, (dim,)),
        labels=list(labels),
        label_matrix=mean_pool_labels(labels, emb),
        scale=scale, bias=bias, threshold=threshold, max_width=max_width,
    )
    return ckpt


def encode_tokens(tokens: List[str], ckpt: DenseCheckpoint) -> np.ndarray:
    """(L, D) token reps via hash-bucket embedding lookup. The trained-
    encoder seam: a transformer replaces this lookup; everything downstream
    (marker head, prompt matmul, decode) is unchanged."""
    V = ckpt.vocab_buckets
    idx = np.fromiter(
        (fold_hash_py(t.lower()) % V for t in tokens), dtype=np.int64,
        count=len(tokens),
    )
    return ckpt.emb[idx]


def score_doc_dense(
    text: str, ckpt: DenseCheckpoint
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Forward pass for one doc: (span_idx (S,2), valid (S,), probs (S,C)).

    tokenize -> embed -> SpanMarkerV0 -> prompt matmul -> sigmoid; all
    float64 (see module doc for why that makes it bit-exact)."""
    tokens, _, _ = tokenize_with_offsets(text)
    if not tokens:
        return (np.zeros((0, 2), np.int64), np.zeros(0, bool),
                np.zeros((0, len(ckpt.labels))))
    span_idx, valid = enumerate_spans(len(tokens), ckpt.max_width)
    h = encode_tokens(tokens, ckpt)
    rep = span_marker_v0(h, span_idx, ckpt.marker())
    logits = (rep @ ckpt.label_matrix.T - ckpt.bias) * ckpt.scale
    return span_idx, valid, sigmoid(logits)


def predict_spans_dense(text: str, ckpt: DenseCheckpoint) -> List[dict]:
    """Scored span grid above threshold (undedoded candidates — the decode
    stage is shared with the gather path and oracle-gated separately)."""
    span_idx, valid, probs = score_doc_dense(text, ckpt)
    if probs.size == 0:
        return []
    # one vectorized mask instead of a nonzero call per valid row; the
    # row-major (row, class) emission order is unchanged
    keep = valid[:, None] & (probs >= ckpt.threshold)
    s_i, c_i = np.nonzero(keep)
    labels = ckpt.labels
    return [
        {
            "word_start": int(span_idx[s, 0]),
            "word_end": int(span_idx[s, 1]),
            "label": labels[c],
            "score": float(probs[s, c]),
        }
        for s, c in zip(s_i, c_i)
    ]
