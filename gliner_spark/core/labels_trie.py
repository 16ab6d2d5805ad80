"""Labels trie + constrained greedy decoding (pure Python).

Reference parity: gliner/decoding/trie/trie.cpp:1-170 +
labels_trie.pyx:1-40 (the Cython/C++ fast path) and
decoding/trie/python_labels_trie.py (the fallback) define a token-id trie
with PERMANENT nodes: sequences inserted at construction are permanent
and survive `remove_entity`; sequences added later are removable, but
removal never deletes a node that still has children (a shared prefix) or
is permanent. `get(prefix)` returns the allowed next token ids in
insertion order, or [] when the prefix is not a path.

The consumer is the constrained generation loop
(gliner/modeling/decoder.py:185-300 generate_from_embeds_custom): at each
step the allowed-token set is `trie.get(generated_so_far)`, an empty set
degrades to [eos], and greedy decoding takes the argmax over the allowed
set only. gliner/model.py:3173-3197 (set_labels_trie) builds the trie
from tokenized labels with EOS appended to every sequence.

This module re-implements those semantics from the spec above — the node
store is a [permanent, children-dict] pair per node rather than a Node
class, and the scorer is the engine's deterministic integer hash family
(so the DuckDB oracle replays generation exactly) — it is NOT a line port.
The imperative per-sequence loop is the torch seam: a real generative
decoder drops into `score_fn` without touching the trie or the Spark
plumbing (operators/constrained.py).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

from gliner_spark.core.dense import P31, fold_hash_py as fold_hash

EOS = 0  # reserved token id (fold_hash of a non-empty word is never 0 in practice)
_KNUTH = 2654435761


class LabelsTrie:
    """Token-id trie with permanent-node semantics (see module docstring).

    Nodes are [permanent: bool, children: dict[int, node]] pairs; python
    dicts preserve insertion order, matching the reference's
    vector-ordered child iteration (trie.cpp get_children)."""

    def __init__(self, sequences: Optional[Iterable[Sequence[int]]] = None):
        self._root = [True, {}]
        if sequences:
            for seq in sequences:
                self._insert(seq, True)

    def _insert(self, seq: Sequence[int], permanent: bool) -> None:
        node = self._root
        for tok in seq:
            child = node[1].get(tok)
            if child is None:
                child = [permanent, {}]
                node[1][tok] = child
            node = child

    def add(self, tokens: Sequence[int]) -> None:
        """Add one removable sequence (reference LabelsTrie.add)."""
        self._insert(tokens, False)

    def add_batch(self, sequences: Iterable[Sequence[int]]) -> None:
        for seq in sequences:
            self._insert(seq, False)

    def _path(self, prefix: Sequence[int]):
        """Nodes along `prefix` starting at root, or None if not a path
        (reference Trie.get_branch, which returns [] on a miss)."""
        node = self._root
        out = [node]
        for tok in prefix:
            node = node[1].get(tok)
            if node is None:
                return None
            out.append(node)
        return out

    def get(self, prefix: Sequence[int]) -> List[int]:
        """Allowed next token ids after `prefix`, insertion-ordered; []
        when the prefix is not a path (reference get_possible_next_keys)."""
        path = self._path(prefix)
        return [] if path is None else list(path[-1][1].keys())

    def remove_entity(self, tokens: Sequence[int]) -> None:
        """Remove one sequence, leaf-up, stopping at the first node that
        still has children OR is permanent (reference Trie.remove_entity:
        shared prefixes and construction-time sequences survive)."""
        path = self._path(tokens)
        if path is None or len(path) <= 1:
            return
        for depth in range(len(path) - 1, 0, -1):
            node = path[depth]
            if node[1] or node[0]:  # has children / permanent
                break
            del path[depth - 1][1][tokens[depth - 1]]

    def remove_batch(self, sequences: Iterable[Sequence[int]]) -> None:
        for seq in sequences:
            self.remove_entity(seq)


def tokenize_labels(labels: Iterable[str]):
    """(sequences, id2word): label strings -> word-token-id sequences with
    EOS appended — reference set_labels_trie (model.py:3186-3196), which
    strips BOS and appends eos_token_id to every tokenized label."""
    id2word = {}
    seqs = []
    for lab in labels:
        seq = []
        for w in lab.split(" "):
            t = fold_hash(w)
            if t == EOS:  # ADVICE r5: a word aliasing EOS would silently
                # truncate the trie path and diverge from the oracle —
                # enforce the reserved-id invariant instead of assuming it.
                raise ValueError(
                    f"label word {w!r} hashes to the reserved EOS id "
                    f"({EOS}); remap the label vocabulary"
                )
            id2word[t] = w
            seq.append(t)
        seq.append(EOS)
        seqs.append(seq)
    return seqs, id2word


def gen_score(nid: int, step: int, tok: int) -> int:
    """Deterministic stand-in 'logit' for (span nid, step, token) — the
    same affine mod-P31 integer family as the rest of the stand-in model,
    replayed verbatim by the DuckDB oracle (kg_constrained_labels)."""
    return (((nid * 31 + step) % P31) * _KNUTH + tok) % P31


def constrained_greedy(
    nid: int,
    trie: LabelsTrie,
    id2word: dict,
    max_new_tokens: int = 4,
    score_fn=gen_score,
) -> str:
    """Greedy constrained generation of ONE label sequence (reference
    generate_from_embeds_custom, decoder.py:245-270): allowed =
    trie.get(generated); empty allowed degrades to [EOS]; argmax over the
    allowed set only (ties -> smallest token id); stop at EOS."""
    prefix: List[int] = []
    words: List[str] = []
    for step in range(max_new_tokens):
        allowed = trie.get(prefix) or [EOS]
        pick = max(allowed, key=lambda t: (score_fn(nid, step, t), -t))
        if pick == EOS:
            break
        prefix.append(pick)
        words.append(id2word.get(pick, ""))
    return " ".join(words)


def free_greedy(
    nid: int,
    vocab: Sequence[int],
    id2word: dict,
    max_new_tokens: int = 4,
    score_fn=gen_score,
) -> str:
    """Unconstrained counterpart: argmax over the FULL vocab (+EOS) each
    step — free to leave every valid label path, which is exactly what the
    trie prevents (the planted-fixture divergence the gate asserts)."""
    words: List[str] = []
    for step in range(max_new_tokens):
        pick = max(vocab, key=lambda t: (score_fn(nid, step, t), -t))
        if pick == EOS:
            break
        words.append(id2word.get(pick, ""))
    return " ".join(words)
