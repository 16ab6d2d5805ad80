"""Candidate-span enumeration.

Parity target: reference prepare_span_idx
(gliner/data_processing/utils.py:215-255): all (start, start+width) pairs for
width in [0, max_width), END-INCLUSIVE, row-major (start asc, width asc),
with a validity mask end <= num_tokens - 1 (decoder.py:297-302).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np


@dataclass
class Span:
    """Word-level span; mirrors reference decoder.py:28-46 (end EXCLUSIVE here
    is NOT the convention — reference Span.end is exclusive in the dataclass
    docstring but decode emits inclusive word ends; we keep END-INCLUSIVE
    word indices throughout, as in decoder._decode_batch output, and convert
    to exclusive char offsets only at the text-mapping step."""

    start: int
    end: int  # word index, inclusive (reference decode convention)
    entity_type: str
    score: float
    class_probs: Optional[Dict[str, float]] = None


from functools import lru_cache


@lru_cache(maxsize=4096)
def _enumerate_cached(num_tokens: int, max_width: int):
    starts = np.repeat(np.arange(num_tokens, dtype=np.int64), max_width)
    widths = np.tile(np.arange(max_width, dtype=np.int64), num_tokens)
    ends = starts + widths
    span_idx = np.stack([starts, ends], axis=1)
    valid = ends <= (num_tokens - 1)
    span_idx.setflags(write=False)
    valid.setflags(write=False)
    return span_idx, valid


def enumerate_spans(num_tokens: int, max_width: int):
    """Vectorized span table.

    Returns (span_idx, valid) where span_idx is int64 (num_tokens*max_width, 2)
    [start, end_inclusive] in the exact row-major order of the reference's
    prepare_span_idx, and valid marks end <= num_tokens-1. Cached per
    (L, K) — the arrays are READ-ONLY; callers needing a mutable mask
    (allowed_spans) must copy, which predict_doc does via the `&` operator
    creating a new array.
    """
    if num_tokens <= 0:
        return np.zeros((0, 2), dtype=np.int64), np.zeros((0,), dtype=bool)
    return _enumerate_cached(num_tokens, max_width)
