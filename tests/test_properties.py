"""Property-based tests (hypothesis) for the core invariants."""

from hypothesis import given, settings
from hypothesis import strategies as st

from gliner_spark.core.decode import greedy_search, has_overlapping
from gliner_spark.core.spans import Span, enumerate_spans
from gliner_spark.core.tokenization import tokenize_with_offsets
from gliner_spark.sources.synth import assembled_text, gen_doc


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_tokenizer_offsets_are_exact_slices(text):
    toks, starts, ends = tokenize_with_offsets(text)
    assert len(toks) == len(starts) == len(ends)
    prev_end = -1
    for t, s, e in zip(toks, starts, ends):
        assert 0 <= s < e <= len(text)
        assert text[s:e] == t
        assert s >= prev_end  # non-overlapping, left-to-right
        prev_end = e
        assert not t.strip() == "" and "\n" not in t and " " not in t


@given(st.integers(0, 40), st.integers(1, 15))
@settings(max_examples=100, deadline=None)
def test_enumerate_spans_invariants(n, k):
    idx, valid = enumerate_spans(n, k)
    assert idx.shape == (n * k, 2)
    for (s, e), v in zip(idx.tolist(), valid.tolist()):
        assert e - s < k and s >= 0
        assert v == (e <= n - 1)


_span = st.builds(
    Span,
    start=st.integers(0, 30),
    end=st.integers(0, 40),
    entity_type=st.sampled_from(["a", "b", "c"]),
    score=st.floats(0.01, 1.0, allow_nan=False),
).filter(lambda s: s.end >= s.start)


@given(st.lists(_span, max_size=25), st.booleans(), st.booleans())
@settings(max_examples=200, deadline=None)
def test_greedy_invariants(spans, flat, multi):
    out = greedy_search(list(spans), flat_ner=flat, multi_label=multi)
    # subset of the input, sorted by start
    assert all(any(o is s for s in spans) for o in out)
    assert [o.start for o in out] == sorted(o.start for o in out)
    if flat:  # pairwise non-overlapping in flat mode
        for i, a in enumerate(out):
            for b in out[i + 1 :]:
                assert not has_overlapping(
                    (a.start, a.end, a.entity_type),
                    (b.start, b.end, b.entity_type),
                    multi,
                )
    # idempotence: greedy(greedy(x)) == greedy(x)
    again = greedy_search(list(out), flat_ner=flat, multi_label=multi)
    assert [(s.start, s.end, s.entity_type) for s in again] == [
        (s.start, s.end, s.entity_type) for s in out
    ]


@given(st.integers(0, 100000))
@settings(max_examples=60, deadline=None)
def test_synth_gold_offsets_always_slice_exactly(i):
    doc = gen_doc(i)
    text = assembled_text(doc["spans"])
    for g in doc["gold_mentions"]:
        assert text[g["start"] : g["end"]] == g["text"]
    # span offsets point at their own text
    for sp in doc["spans"]:
        if sp["kind"] == "text":
            assert text[sp["offset"] : sp["offset"] + len(sp["text"])] == sp["text"]


# ---- round 2: fold-hash engine parity (python == Spark == DuckDB) ----------
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=8, unique=True,
    )
)
@settings(max_examples=25, deadline=None)
def test_fold_hash_python_equals_duckdb(tokens):
    """The codepoint-fold hash (functions/text.fold_hash arithmetic) gives
    the same value in pure python and in DuckDB's list_reduce idiom — the
    property the zero-shuffle token ids and every dedup oracle rest on."""
    import duckdb

    from gliner_spark.core.dense import fold_hash_py

    con = duckdb.connect()
    got = con.execute(
        "SELECT list_transform(?, tok -> "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(length(tok)), "
        "i -> CAST(ascii(substring(tok, CAST(i+1 AS INT), 1)) AS BIGINT))), "
        "(acc, cp) -> (acc*1000003 + cp) % 2147483647))",
        [tokens],
    ).fetchone()[0]
    assert got == [fold_hash_py(t) for t in tokens]


def test_fold_hash_spark_equals_python(spark):
    from pyspark.sql import functions as F

    from gliner_spark.core.dense import fold_hash_py
    from gliner_spark.functions.text import fold_hash

    toks = ["", "a", "acme", "works_at", "media://00ff", "x" * 40, "."]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {r.tok: r.h for r in df.select("tok", fold_hash("tok").alias("h")).collect()}
    assert got == {t: fold_hash_py(t) for t in toks}


_seq = st.lists(st.integers(1, 6), min_size=1, max_size=4)


@given(
    st.lists(_seq, max_size=6),  # permanent (construction) sequences
    st.lists(_seq, max_size=6),  # removable (added) sequences
)
@settings(max_examples=150, deadline=None)
def test_labels_trie_matches_set_model(perm, added):
    """r5: the trie's get() must agree with a naive set-of-sequences model
    on every reachable prefix, before and after removing the added
    sequences (permanent ones survive removal; shared prefixes survive
    partial removal)."""
    from gliner_spark.core.labels_trie import LabelsTrie

    trie = LabelsTrie(perm)
    trie.add_batch(added)

    def model_next(seqs, prefix):
        n = len(prefix)
        out = []
        for s in seqs:
            if len(s) > n and list(s[:n]) == list(prefix) and s[n] not in out:
                out.append(s[n])
        return out

    def check(seqs):
        prefixes = {()} | {
            tuple(s[:i]) for s in seqs for i in range(1, len(s) + 1)
        }
        for p in prefixes:
            assert sorted(trie.get(list(p))) == sorted(model_next(seqs, p)), (
                p, seqs,
            )

    check(perm + added)
    trie.remove_batch(added)
    # after removal: permanent sequences fully intact; an added sequence
    # may leave nodes alive only where it shares a prefix with a survivor
    for p in perm:
        node_path = [p[:i] for i in range(len(p))]
        for pref in node_path:
            assert p[len(pref)] in trie.get(list(pref))
    # no token reachable that no permanent sequence explains, except
    # prefixes shared with permanent paths (removal stops at shared nodes)
    for s in added:
        if not any(
            len(q) >= len(s) and list(q[: len(s)]) == list(s) for q in perm
        ):
            # the full added path must be gone unless a permanent sequence
            # extends through it
            leaf_next = trie.get(list(s))
            assert sorted(leaf_next) == sorted(model_next(perm, tuple(s)))
