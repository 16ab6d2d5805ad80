"""Deterministic greedy BPE subword tokenizer.

Reference seam: GLiNER's processor runs a HuggingFace subword tokenizer
under the word splitter (gliner/data_processing/processor.py); the
container has no `tokenizers`, so this is a from-scratch byte-pair-encoding
implementation with the standard train/encode semantics:

- train: iteratively merge the most frequent adjacent symbol pair over a
  word-frequency table (ties broken lexicographically — deterministic for
  any corpus order), like the original BPE algorithm (Sennrich et al.);
- encode: apply the learned merges to a word by merge priority.

Pure python; pickles into the extraction UDF like every other model piece
(ship via sc.broadcast). A real exported tokenizer.json drops into
``BpeTokenizer(merges=...)`` unchanged in shape.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Sequence, Tuple

END = "</w>"  # end-of-word marker (standard BPE word-boundary symbol)


def _pair_counts(vocab: Dict[Tuple[str, ...], int]) -> Counter:
    counts: Counter = Counter()
    for sym, freq in vocab.items():
        for a, b in zip(sym, sym[1:]):
            counts[(a, b)] += freq
    return counts


def _merge_vocab(vocab: Dict[Tuple[str, ...], int], pair: Tuple[str, str]):
    a, b = pair
    merged = a + b
    out = {}
    for sym, freq in vocab.items():
        new_sym, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                new_sym.append(merged)
                i += 2
            else:
                new_sym.append(sym[i])
                i += 1
        out[tuple(new_sym)] = out.get(tuple(new_sym), 0) + freq
    return out


class BpeTokenizer:
    """merges: ordered list of (left, right) pairs (priority = position)."""

    def __init__(self, merges: Sequence[Tuple[str, str]]):
        self.merges = list(merges)
        self._rank = {tuple(p): i for i, p in enumerate(self.merges)}

    # ----- training ------------------------------------------------------
    @staticmethod
    def train(words: Iterable[str], n_merges: int = 200) -> "BpeTokenizer":
        """Learn merges from a word stream. Deterministic: pair selection is
        (max count, lexicographically smallest pair) — independent of input
        order."""
        wfreq = Counter(words)
        vocab = {tuple(w) + (END,): f for w, f in wfreq.items() if w}
        merges: List[Tuple[str, str]] = []
        for _ in range(n_merges):
            counts = _pair_counts(vocab)
            if not counts:
                break
            # tie-break: highest count, then lexicographically SMALLEST pair
            top = max(counts.values())
            pair = min(p for p, c in counts.items() if c == top)
            if counts[pair] < 2:
                break
            merges.append(pair)
            vocab = _merge_vocab(vocab, pair)
        return BpeTokenizer(merges)

    # ----- encoding ------------------------------------------------------
    def encode_word(self, word: str) -> List[str]:
        """Greedy merge application by training priority (the standard BPE
        encode loop). Returns subword pieces; ``join('') == word + END``."""
        if not word:
            return []
        sym = list(word) + [END]
        while len(sym) > 1:
            ranked = [
                (self._rank.get((sym[i], sym[i + 1])), i)
                for i in range(len(sym) - 1)
            ]
            ranked = [(r, i) for r, i in ranked if r is not None]
            if not ranked:
                break
            _, i = min(ranked)
            sym[i : i + 2] = [sym[i] + sym[i + 1]]
        return sym

    def encode(self, text: str) -> List[str]:
        out: List[str] = []
        for w in text.split():
            out.extend(self.encode_word(w))
        return out

    # ----- persistence (npz-free: merges are strings) --------------------
    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            for a, b in self.merges:
                f.write(f"{a}\t{b}\n")

    @staticmethod
    def load(path: str) -> "BpeTokenizer":
        merges = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                a, b = line.rstrip("\n").split("\t")
                merges.append((a, b))
        return BpeTokenizer(merges)
