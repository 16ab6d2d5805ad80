"""Real-encoder seam.

GlinerSparkModel's scoring surface needs exactly two artifacts per batch:
span representations (S, D) and a frozen label-prompt matrix (C, D). Two
torch-free fills exist today:

- the deterministic hash construction (core/model.py) — exact-parity tests;
- the RUNNABLE npz-checkpoint dense path (core/dense.py): hash-bucket token
  embeddings -> SpanMarkerV0 -> mean-pooled prompts, weights loaded from a
  single .npz and shipped by sc.broadcast (operators/extraction.
  extract_spans_dense) — accepts real exported GLiNER head weights as-is.

This module stubs the remaining transformer-backed variants so swapping
them in touches zero Spark code:

1. driver: load checkpoint, embed the label strings ONCE
   (encode_labels / compress_prompt_embeddings, reference
   model.py:2455-2709) -> numpy (C, D) -> broadcast;
2. executor: per Arrow batch, run the token encoder + word pooling +
   SpanMarkerV0 (numpy port in core/heads.py takes the exported weights)
   -> (S, D) -> the same matmul/sigmoid/greedy path.

Both torch and onnxruntime are optional: the container for this build has
neither, so construction raises ImportError with the exact dependency.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class TorchSpanEncoder:
    """Trained-encoder adapter (requires torch + transformers).

    Usage (on a real cluster):
        enc = TorchSpanEncoder("urchade/gliner_small")  # driver
        label_matrix = enc.encode_labels(labels)        # (C, D), broadcast
        # executors: enc shipped via spark.files / --py-files; per-process
        # singleton via functools.lru_cache, batch through enc.span_reps
    """

    def __init__(self, model_name_or_path: str, device: str = "cpu"):
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - not in this container
            raise ImportError(
                "TorchSpanEncoder needs torch+transformers; this container "
                "ships neither. Use the deterministic GlinerSparkModel for "
                "tests, or install torch on the cluster image."
            ) from e
        raise NotImplementedError(
            "wire HF encoder -> word pooling -> SpanMarkerV0 here; the "
            "numpy-side math (span_marker_v0, score_spans) already exists "
            "in gliner_spark.core.heads and is unit-tested."
        )

    def encode_labels(self, labels: Sequence[str]) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def span_reps(
        self, tokens: List[str], span_idx: np.ndarray
    ) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class OnnxSpanEncoder:
    """ONNX Runtime variant (reference model.py:1493-1556 exports; CPU
    scoring inside executors without torch)."""

    def __init__(self, onnx_path: str):
        try:
            import onnxruntime  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError("OnnxSpanEncoder needs onnxruntime.") from e
        raise NotImplementedError  # pragma: no cover
