"""Multimodal columns: opaque binary payloads + typed metadata.

Media spans carry a `media_ref`; real deployments resolve refs to binary
blobs (image/audio/video) in an object store. This module implements the
Spark-side plumbing — schema, partition-preserving mapInPandas decode stage,
Arrow batch shape — with the codec layer stubbed: the container has no
image/audio libraries, so `decode_media` produces deterministic fake
features (and documents where a real decoder plugs in).

Pattern: keep binaries OUT of shuffles. Decode/feature-extract runs as a
narrow mapInPandas directly over the scan; only small typed features
(dims, duration, feature vector) flow into joins downstream.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_DDL = (
    "media_ref string, kind string, n_bytes long, "
    "width int, height int, feature array<float>"
)


_P31 = 2147483647
_FEAT_DIM = 32


def _ref_fold(ref: str) -> int:
    """Codepoint fold hash of the ref (engine-neutral arithmetic — the SQL
    oracle reproduces the whole decode stub exactly)."""
    h = 0
    for ch in ref:
        h = (h * 1000003 + ord(ch)) % _P31
    return h


def _fake_decode(ref: str, payload: bytes | None):
    """Deterministic stand-in for the codec layer.

    A real implementation would be:
        img = PIL.Image.open(io.BytesIO(payload))   # or torchaudio/av
        ...resize / frame-sample / embed...
    which is unavailable in this container; features derive from an
    arithmetic hash of the ref: reproducible end-to-end AND by the SQL
    oracle. Feature values are dyadic rationals ((2k-255)/256), exactly
    representable in float32 -> bit-identical across engines.
    """
    base = _ref_fold(ref)
    width = 64 + ((base * 7 + 1) % _P31) % 192
    height = 64 + ((base * 11 + 3) % _P31) % 192
    ks = [((base * (2 * i + 5) + i) % _P31) % 256 for i in range(_FEAT_DIM)]
    feat = np.array([(k - 127.5) / 128.0 for k in ks], dtype=np.float32)
    return width, height, feat


def decode_media(media: DataFrame) -> DataFrame:
    """media(media_ref, kind, payload binary|null) -> typed features.

    Arrow-batched; one pass; no shuffle. payload may be null (ref-only
    tables) — the stub never dereferences it.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            payloads = b["payload"] if "payload" in b.columns else [None] * len(b)
            for ref, kind, payload in zip(b["media_ref"], b["kind"], payloads):
                w, h, feat = _fake_decode(ref, payload)
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": kind,
                        "n_bytes": len(payload) if payload is not None else 0,
                        "width": w,
                        "height": h,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "kind", "n_bytes", "width", "height", "feature"
                ],
            )

    return media.mapInPandas(fn, schema=MEDIA_FEATURES_DDL)


def media_nodes(docs: DataFrame) -> DataFrame:
    """Distinct media references from interleaved docs (the graph's media
    node table): explode is narrow; distinct is the only shuffle."""
    return (
        docs.select(F.explode("spans").alias("sp"))
        .filter(F.col("sp.kind") == "media")
        .select(
            F.col("sp.media_ref").alias("media_ref"),
            F.lit("image").alias("kind"),
            F.col("sp.text").alias("caption"),
        )
        .groupBy("media_ref", "kind")
        .agg(F.count(F.lit(1)).alias("n_occurrences"), F.min("caption").alias("caption"))
    )
