"""Deterministic hash embeddings and hash utilities.

This is the torch-free encoder stand-in (see core/encoder.py for why):
every string gets a reproducible pseudo-random unit vector derived from
BLAKE2b in counter mode. Independent strings get near-orthogonal vectors
(E[dot] = 0, std 1/sqrt(D)), which makes matched-filter scoring exact at
the dims we use. No dependence on PYTHONHASHSEED or platform.
"""

from __future__ import annotations

import hashlib
import struct
from functools import lru_cache
from typing import Dict, Iterable, List

import numpy as np
from numpy.random import Generator, Philox


def hash_unit_vec(s: str, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic unit vector for a string (float32).

    BLAKE2b keys a Philox counter-based generator, so the vector is
    reproducible across processes/executors (no PYTHONHASHSEED dependence)
    and fast to produce (~10-20 us at dim 2048).
    """
    d = hashlib.blake2b(f"{seed}\x00{s}".encode("utf-8"), digest_size=16).digest()
    key = np.frombuffer(d, dtype="<u8")
    v = Generator(Philox(key=key)).standard_normal(dim)
    n = np.linalg.norm(v)
    return (v / n).astype(np.float32) if n > 0 else v.astype(np.float32)


class TokenVecCache:
    """Per-process cache of token hash vectors (executor-local singleton)."""

    def __init__(self, dim: int, seed: int = 42, norm: str = "unit"):
        self.dim = dim
        self.seed = seed
        self._cache: Dict[str, np.ndarray] = {}

    def get(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            v = hash_unit_vec(token.lower(), self.dim, self.seed)
            self._cache[token] = v
        return v

    def matrix(self, tokens: Iterable[str]) -> np.ndarray:
        return np.stack([self.get(t) for t in tokens])


def phrase_unit_vec(tokens: List[str], cache: TokenVecCache) -> np.ndarray:
    """Unit-normalized sum of token vectors (order-insensitive bag)."""
    if not tokens:
        return np.zeros(cache.dim, dtype=np.float32)
    v = np.sum([cache.get(t) for t in tokens], axis=0)
    n = np.linalg.norm(v)
    return (v / n).astype(np.float32) if n > 0 else v


@lru_cache(maxsize=8)
def _cache_singleton(dim: int, seed: int) -> TokenVecCache:
    return TokenVecCache(dim, seed)


def get_token_cache(dim: int, seed: int = 42) -> TokenVecCache:
    """Executor-local singleton (avoids rebuilding per Arrow batch)."""
    return _cache_singleton(dim, seed)


def hash64(s: str, seed: int = 0) -> int:
    """Stable 63-bit hash of a string (for minhash / fingerprints)."""
    d = hashlib.blake2b(s.encode("utf-8"), digest_size=8, salt=struct.pack("<Q", seed)).digest()
    return int.from_bytes(d, "little") & 0x7FFFFFFFFFFFFFFF
