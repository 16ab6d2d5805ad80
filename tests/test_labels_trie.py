"""Reference-parity tests for the labels trie + constrained decode
(reference gliner/decoding/trie/trie.cpp:1-170, python_labels_trie.py,
modeling/decoder.py:245-270, model.py:3186-3196)."""

from gliner_spark.core.labels_trie import (
    EOS,
    LabelsTrie,
    constrained_greedy,
    fold_hash,
    free_greedy,
    gen_score,
    tokenize_labels,
)


def test_get_returns_children_in_insertion_order():
    t = LabelsTrie([[1, 2, 3], [1, 5], [1, 4]])
    assert t.get([]) == [1]
    assert t.get([1]) == [2, 5, 4]  # vector-ordered like the C++ trie
    assert t.get([1, 2]) == [3]
    assert t.get([1, 2, 3]) == []  # leaf: no children


def test_get_on_non_path_returns_empty():
    t = LabelsTrie([[1, 2]])
    assert t.get([9]) == []
    assert t.get([1, 9]) == []
    assert t.get([1, 2, 9]) == []


def test_construction_sequences_are_permanent():
    t = LabelsTrie([[1, 2, 3]])
    t.remove_entity([1, 2, 3])  # permanent: survives removal
    assert t.get([1, 2]) == [3]


def test_added_sequences_are_removable():
    t = LabelsTrie()
    t.add([1, 2, 3])
    assert t.get([1, 2]) == [3]
    t.remove_entity([1, 2, 3])
    assert t.get([]) == []  # whole branch gone


def test_removal_stops_at_shared_prefix():
    t = LabelsTrie()
    t.add_batch([[1, 2, 3], [1, 2, 9]])
    t.remove_entity([1, 2, 3])
    assert t.get([1, 2]) == [9]  # shared prefix survives
    assert t.get([1, 2, 3]) == []


def test_removal_stops_at_permanent_node():
    t = LabelsTrie([[1, 2]])  # permanent path
    t.add([1, 2, 3])  # removable extension
    t.remove_entity([1, 2, 3])
    assert t.get([1]) == [2]  # permanent prefix intact
    assert t.get([1, 2]) == []


def test_remove_missing_is_noop():
    t = LabelsTrie([[1, 2]])
    t.remove_entity([7, 8])
    t.remove_entity([])
    assert t.get([1]) == [2]


def test_remove_batch():
    t = LabelsTrie()
    t.add_batch([[1, 2], [3, 4]])
    t.remove_batch([[1, 2], [3, 4]])
    assert t.get([]) == []


def test_tokenize_labels_appends_eos():
    seqs, id2word = tokenize_labels(["big cat", "dog"])
    assert [len(s) for s in seqs] == [3, 2]
    assert all(s[-1] == EOS for s in seqs)
    assert id2word[fold_hash("cat")] == "cat"


def test_constrained_stays_on_label_paths():
    labels = ["chemical compound", "chemical element", "person"]
    seqs, id2word = tokenize_labels(labels)
    trie = LabelsTrie(seqs)
    vocab = sorted({t for s in seqs for t in s} | {EOS})
    n_diff = 0
    for norm in ["alice", "benzene", "acme corp", "oxygen", "bob stone"]:
        nid = fold_hash(norm)
        con = constrained_greedy(nid, trie, id2word)
        assert con in labels  # the trie guarantee
        if con != free_greedy(nid, vocab, id2word):
            n_diff += 1
    assert n_diff > 0  # the free decoder leaves the valid set somewhere


def test_constrained_matches_manual_greedy():
    """Replay one generation by hand with gen_score to pin the argmax +
    tie rule (score DESC, tok ASC) the oracle SQL also implements."""
    labels = ["big cat", "big dog"]
    seqs, id2word = tokenize_labels(labels)
    trie = LabelsTrie(seqs)
    nid = fold_hash("x")
    t_big = fold_hash("big")
    assert trie.get([]) == [t_big]
    step1 = trie.get([t_big])  # [cat, dog]
    best = max(step1, key=lambda t: (gen_score(nid, 1, t), -t))
    expect = "big " + id2word[best]
    assert constrained_greedy(nid, trie, id2word) == expect


def test_gate_fixture_differs_splits(spark):
    """r6 (VERDICT ask #5): the kg_constrained_labels fixture must be
    DISCRIMINATING — a meaningful fraction of free generations land on
    valid label paths (differs=false, agreement) while others diverge
    (differs=true, the trie pruning is load-bearing), including at least
    one multi-word agreement (the free decoder walked a full trie path)."""
    from gliner_spark.operators.constrained import generate_mention_labels
    from __spark_entry__ import GEN_LABELS, _mentions

    rows = generate_mention_labels(
        _mentions(spark, "/root/testdata/sf0.001"), GEN_LABELS
    ).collect()
    n_true = sum(r.differs for r in rows)
    n_false = sum(not r.differs for r in rows)
    assert n_true >= 10 and n_false >= 10, (n_true, n_false)
    # every constrained label is valid; some free label is NOT (pruning
    # matters), and some agreement covers a multi-word label path
    assert all(r.constrained_label in GEN_LABELS for r in rows)
    assert any(r.free_label not in GEN_LABELS for r in rows)
    assert any(
        not r.differs and " " in r.constrained_label for r in rows
    )


def test_tokenize_labels_rejects_eos_alias():
    """ADVICE r5: a label word whose fold_hash equals the reserved EOS id
    must raise, not silently truncate the trie path. fold_hash("") == 0
    is the constructible alias (double-space label -> empty word)."""
    import pytest

    assert fold_hash("") == EOS
    with pytest.raises(ValueError, match="reserved EOS id"):
        tokenize_labels(["person", "bad  label"])
