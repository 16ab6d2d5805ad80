"""Core scoring-library tests.

Ports the semantics covered by the reference's tests/test_decoder.py
(output structure, threshold filtering, span boundaries, flat-vs-nested
overlap removal, lines 60-183) and tests/test_infer_packing.py's
fast-path==baseline discipline, onto our numpy core.
"""

import numpy as np
import pytest

from gliner_spark.config import PipelineConfig
from gliner_spark.core.decode import (
    decode_scores,
    greedy_search,
    has_overlapping,
    has_overlapping_nested,
    is_nested,
    sigmoid,
)
from gliner_spark.core.heads import (
    MarkerV0Weights,
    distmult,
    dot_adjacency,
    score_spans,
    span_marker_v0,
)
from gliner_spark.core.model import GlinerSparkModel, normalize_surface
from gliner_spark.core.spans import Span, enumerate_spans
from gliner_spark.core.tokenization import tokenize_with_offsets
from gliner_spark.presets import default_model
from gliner_spark.sources.synth import assembled_text, gen_doc


# --------------------------------------------------------------- tokenizer
def test_tokenizer_regex_parity():
    # reference tokenizer.py:49 regex \w+(?:[-_]\w+)*|\S with char offsets
    toks, starts, ends = tokenize_with_offsets("state-of-the_art NLP, really!")
    assert toks == ["state-of-the_art", "NLP", ",", "really", "!"]
    assert starts == [0, 17, 20, 22, 28]
    assert ends == [16, 20, 21, 28, 29]
    assert tokenize_with_offsets("")[0] == []
    assert tokenize_with_offsets("   ")[0] == []


# --------------------------------------------------------- span enumeration
def test_enumerate_spans_order_and_validity():
    # reference prepare_span_idx docstring example (utils.py:215-255)
    idx, valid = enumerate_spans(3, 2)
    assert idx.tolist() == [[0, 0], [0, 1], [1, 1], [1, 2], [2, 2], [2, 3]]
    assert valid.tolist() == [True, True, True, True, True, False]


# ------------------------------------------------------- overlap predicates
def test_overlap_predicates():
    # decoding/utils.py:1-19 semantics, end-inclusive spans
    assert has_overlapping((0, 1, "A"), (1, 2, "B"))
    assert not has_overlapping((0, 1, "A"), (2, 3, "B"))
    assert has_overlapping((0, 1, "A"), (0, 1, "B"))
    assert not has_overlapping((0, 1, "A"), (0, 1, "B"), multi_label=True)
    # nested: containment is allowed
    assert not has_overlapping_nested((0, 3, "A"), (1, 2, "B"))
    assert has_overlapping_nested((0, 2, "A"), (1, 3, "B"))
    assert is_nested((0, 3), (1, 2)) and is_nested((1, 2), (0, 3))


# ---------------------------------------------------------------- greedy
def _grid(L, K, C, hot):
    """Build a probs grid: low everywhere, hot entries set high."""
    S = L * K
    probs = np.full((S, C), 0.01)
    idx, valid = enumerate_spans(L, K)
    for (l, k, c), p in hot.items():
        probs[l * K + k, c] = p
    return probs, idx, valid


def test_flat_ner_removes_overlaps():
    # port of reference test_decoder.py:137-160
    probs, idx, valid = _grid(5, 3, 2, {(0, 0, 0): 0.99, (0, 1, 1): 0.98})
    out = decode_scores(probs, idx, valid, ["PERSON", "LOCATION"], 0.5, flat_ner=True)
    assert len(out) == 1 and out[0].entity_type == "PERSON"


def test_nested_ner_keeps_nested():
    # port of reference test_decoder.py:161-183
    probs, idx, valid = _grid(5, 3, 2, {(0, 0, 0): 0.99, (0, 2, 1): 0.98})
    out = decode_scores(probs, idx, valid, ["PERSON", "LOCATION"], 0.5, flat_ner=False)
    assert len(out) == 2


def test_threshold_filtering_monotone():
    probs, idx, valid = _grid(5, 3, 2, {(0, 0, 0): 0.6, (2, 1, 1): 0.8})
    lo = decode_scores(probs, idx, valid, ["A", "B"], 0.5)
    hi = decode_scores(probs, idx, valid, ["A", "B"], 0.7)
    assert len(lo) >= len(hi) and len(hi) == 1


def test_invalid_spans_never_emitted():
    # span (4, 4+2) exceeds the 5-token sequence -> masked (decoder.py:297)
    probs, idx, valid = _grid(5, 3, 2, {(4, 2, 0): 0.99})
    out = decode_scores(probs, idx, valid, ["A", "B"], 0.5)
    assert out == []


def test_multi_label_keeps_same_span_twice():
    probs, idx, valid = _grid(5, 3, 2, {(1, 1, 0): 0.9, (1, 1, 1): 0.8})
    flat = decode_scores(probs, idx, valid, ["A", "B"], 0.5, multi_label=False)
    multi = decode_scores(probs, idx, valid, ["A", "B"], 0.5, multi_label=True)
    assert len(flat) == 1 and len(multi) == 2


def test_greedy_output_sorted_by_start():
    spans = [Span(3, 4, "A", 0.7), Span(0, 1, "B", 0.9), Span(6, 6, "C", 0.8)]
    out = greedy_search(spans)
    assert [s.start for s in out] == [0, 3, 6]


def test_greedy_deterministic_tiebreak():
    # equal scores: earlier (start, end, class) wins, stable across shuffles
    probs, idx, valid = _grid(5, 3, 2, {(0, 0, 0): 0.9, (0, 1, 1): 0.9})
    out = decode_scores(probs, idx, valid, ["A", "B"], 0.5, flat_ner=True)
    assert len(out) == 1 and out[0].start == 0 and out[0].entity_type == "A"


# ------------------------------------------------------------------ heads
def test_span_marker_v0_shapes_and_math():
    rng = np.random.default_rng(0)
    D, L = 8, 4
    w = MarkerV0Weights.random(D, seed=1)
    h = rng.normal(size=(L, D)).astype(np.float32)
    idx, _ = enumerate_spans(L, 2)
    rep = span_marker_v0(h, idx, w)
    assert rep.shape == (L * 2, D)
    # hand-compute one span rep (start=1, end=2 -> row 3 in row-major order)
    cat = np.concatenate([(h @ w.w_start)[1], (h @ w.w_end)[2]])
    cat = np.maximum(cat, 0)
    np.testing.assert_allclose(rep[3], cat @ w.w_out + w.b_out, rtol=1e-5)


def test_distmult_and_adjacency():
    h = np.array([1.0, 2.0]); r = np.array([3.0, 0.5]); t = np.array([2.0, 1.0])
    assert distmult(h, r, t) == pytest.approx(1 * 3 * 2 + 2 * 0.5 * 1)
    x = np.eye(2)
    adj = dot_adjacency(x)
    assert adj[0, 0] == pytest.approx(sigmoid(np.array([1.0]))[0])
    assert adj[0, 1] == pytest.approx(0.5)


def test_score_spans_is_the_einsum_slice():
    rng = np.random.default_rng(2)
    rep = rng.normal(size=(6, 4)); lab = rng.normal(size=(3, 4))
    got = score_spans(rep, lab, scale=2.0, bias=0.1)
    want = sigmoid((np.einsum("sd,cd->sc", rep, lab) - 0.1) * 2.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ------------------------------------------------------------------ model
def test_fast_path_matches_dense_baseline():
    # the reference's packing test discipline (test_infer_packing.py:52-77):
    # optimized path must equal the naive baseline bit-for-bit
    m = default_model()
    for i in range(30):
        text = assembled_text(gen_doc(i)["spans"])
        fast = m.predict_doc(text)[0]
        dense = m.predict_doc_dense(text)
        assert [(x["start"], x["end"], x["label"]) for x in fast] == [
            (x["start"], x["end"], x["label"]) for x in dense
        ]
        np.testing.assert_allclose(
            [x["score"] for x in fast], [x["score"] for x in dense], rtol=1e-5
        )


def test_model_rejects_cross_type_surface():
    with pytest.raises(ValueError):
        GlinerSparkModel.from_gazetteer(
            {"a": ["acme"], "b": ["acme"]}, {}, PipelineConfig(dim=64)
        )


def test_empty_and_whitespace_text():
    m = default_model()
    assert m.predict_doc("")[0] == []
    assert m.predict_doc(" \n\t ")[0] == []


def test_normalize_surface():
    assert normalize_surface("  Acme   CORP ") == "acme corp"


# ------------------------------------------------------------------ synth
def test_synth_deterministic_and_offsets_exact():
    a, b = gen_doc(7), gen_doc(7)
    assert a == b
    doc = gen_doc(123)
    text = assembled_text(doc["spans"])
    for g in doc["gold_mentions"]:
        assert text[g["start"] : g["end"]] == g["text"]
    # span offsets: each text span's offset points at its text in assembly
    for sp in doc["spans"]:
        if sp["kind"] == "text":
            assert text[sp["offset"] : sp["offset"] + len(sp["text"])] == sp["text"]


def test_model_finds_planted_gold_exactly():
    m = default_model()
    docs = [gen_doc(i) for i in range(300)]
    from gliner_spark.core.reference_impl import run_reference

    mr, tr = run_reference(docs, m)
    gold = {
        (d["doc_id"], g["start"], g["end"], g["label"])
        for d in docs
        for g in d["gold_mentions"]
    }
    pred = {(r["doc_id"], r["start"], r["end"], r["label"]) for r in mr}
    assert pred == gold
    goldt = {
        (d["doc_id"], g["subj"], g["pred"], g["obj"])
        for d in docs
        for g in d["gold_triples"]
    }
    predt = {(r["doc_id"], r["subj"], r["pred"], r["obj"]) for r in tr}
    assert predt == goldt


def test_words_splitter_factory():
    from gliner_spark.core.tokenization import words_splitter

    ws = words_splitter("whitespace")
    assert ws("a b")[0] == ["a", "b"]
    with pytest.raises(ImportError):
        words_splitter("spacy")
    with pytest.raises(ValueError):
        words_splitter("nope")
