"""Span decoding: sigmoid-threshold + greedy non-overlap selection.

Parity targets:
- has_overlapping / has_overlapping_nested / is_nested:
  reference gliner/decoding/utils.py:1-19 (exact port of the boolean logic).
- greedy_search: reference gliner/decoding/decoder.py:92-137 — sort by score
  desc, keep a span iff it does not overlap (flat) / non-nested-overlap
  (nested) any previously kept span, then sort kept spans by start.
- candidate generation: decoder.py:332-473 (_decode_batch) — one vectorized
  threshold over the (S, C) score grid.

Determinism note (SURVEY §7): the reference sorts by -score only; Python's
stable sort then preserves torch.where's row-major (L, K, C) emission order
for ties. We reproduce that exact order by generating candidates in
row-major (span-row, class) order and using a stable sort on -score — and,
for safety under float equality across partitionings, we additionally
tie-break on (start, end, class_id), which is byte-identical to the
reference order for candidates emitted from the row-major grid.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from gliner_spark.core.spans import Span


def is_nested(idx1, idx2) -> bool:
    """reference decoding/utils.py:1-3."""
    return (idx1[0] <= idx2[0] and idx1[1] >= idx2[1]) or (
        idx2[0] <= idx1[0] and idx2[1] >= idx1[1]
    )


def has_overlapping(idx1, idx2, multi_label: bool = False) -> bool:
    """reference decoding/utils.py:6-11."""
    if idx1[:2] == idx2[:2]:
        return not multi_label
    return not (idx1[0] > idx2[1] or idx2[0] > idx1[1])


def has_overlapping_nested(idx1, idx2, multi_label: bool = False) -> bool:
    """reference decoding/utils.py:14-19."""
    if idx1[:2] == idx2[:2]:
        return not multi_label
    return not ((idx1[0] > idx2[1] or idx2[0] > idx1[1]) or is_nested(idx1, idx2))


def sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x, dtype=np.float64)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def greedy_search(
    spans: List[Span], flat_ner: bool = True, multi_label: bool = False
) -> List[Span]:
    """Exact port of reference decoder.py:92-137 semantics."""
    if not spans:
        return []
    has_ov = has_overlapping if flat_ner else has_overlapping_nested
    new_list: List[Span] = []
    selected: List[Tuple[int, int, str]] = []
    # stable sort by -score keeps candidate emission order for ties
    span_prob = sorted(spans, key=lambda x: -x.score)
    for span in span_prob:
        tup = (span.start, span.end, span.entity_type)
        if not any(has_ov(tup, ex, multi_label) for ex in selected):
            new_list.append(span)
            selected.append(tup)
    new_list.sort(key=lambda x: x.start)
    return new_list


def decode_scores(
    probs: np.ndarray,
    span_idx: np.ndarray,
    valid: np.ndarray,
    id_to_class: Sequence[str],
    threshold: float = 0.5,
    flat_ner: bool = True,
    multi_label: bool = False,
) -> List[Span]:
    """Threshold the (S, C) probability grid and greedy-select.

    probs: sigmoid probabilities, shape (S, C) in the row-major span order of
    enumerate_spans; span_idx: (S, 2) inclusive word spans; valid: (S,) mask.
    Mirrors decoder._decode_batch (one vectorized where) + greedy_search.
    """
    if probs.size == 0:
        return []
    keep = (probs > threshold) & valid[:, None]
    s_i, c_i = np.nonzero(keep)  # row-major (span, class) order == reference
    return decode_candidates(
        s_i, c_i, probs[s_i, c_i], span_idx, id_to_class,
        flat_ner=flat_ner, multi_label=multi_label,
    )


def decode_candidates(
    s_i: np.ndarray,
    c_i: np.ndarray,
    scores: np.ndarray,
    span_idx: np.ndarray,
    id_to_class: Sequence[str],
    flat_ner: bool = True,
    multi_label: bool = False,
) -> List[Span]:
    """Shared decode tail over pre-thresholded candidates.

    (s_i, c_i, scores) must be in row-major (span-row, class) emission
    order — exactly what np.nonzero over the grid produces, and what the
    sparse gather fast path (model._touched_cells) emits — so the stable
    tie-break below reproduces the reference order bit-for-bit on either
    path."""
    if len(s_i) == 0:
        return []
    s_i = np.asarray(s_i)
    c_i = np.asarray(c_i)
    scores = np.asarray(scores, dtype=np.float64)
    # stable tie-break identical to reference emission order (see module doc)
    order = np.lexsort((c_i, span_idx[s_i, 1], span_idx[s_i, 0], -scores))
    cand = [
        Span(
            start=int(span_idx[s, 0]),
            end=int(span_idx[s, 1]),
            entity_type=id_to_class[c],
            score=float(scores_k),
        )
        for s, c, scores_k in zip(s_i[order], c_i[order], scores[order])
    ]
    # candidates are pre-sorted; greedy_search's stable re-sort keeps order
    return greedy_search(cand, flat_ner=flat_ner, multi_label=multi_label)
