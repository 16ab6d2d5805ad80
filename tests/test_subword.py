"""Greedy BPE subword tokenizer (core/subword.py): train determinism,
round-trip, merge semantics, save/load, and UDF-side usage."""

from gliner_spark.core.subword import END, BpeTokenizer
from gliner_spark.sources.synth import assembled_text, gen_doc

CORPUS = [w for i in range(200) for w in assembled_text(gen_doc(i)["spans"]).split()]


def test_train_deterministic_and_order_independent():
    a = BpeTokenizer.train(CORPUS, n_merges=80)
    b = BpeTokenizer.train(list(reversed(CORPUS)), n_merges=80)
    assert a.merges == b.merges and len(a.merges) > 10


def test_round_trip_and_boundary():
    tok = BpeTokenizer.train(CORPUS, n_merges=80)
    for w in ["acme", "almeida", "established", "zzzunseenzzz", "a"]:
        pieces = tok.encode_word(w)
        assert "".join(pieces) == w + END, (w, pieces)
    assert tok.encode_word("") == []


def test_frequent_words_compress():
    """High-frequency surface tokens must merge into fewer pieces than
    characters (the point of BPE)."""
    tok = BpeTokenizer.train(CORPUS, n_merges=200)
    freq = max(set(CORPUS), key=CORPUS.count)
    assert len(tok.encode_word(freq)) < len(freq) + 1


def test_hand_merge_semantics():
    # corpus: 'abab' x3, 'ab' x2 -> first merge must be ('a','b')
    tok = BpeTokenizer.train(["abab"] * 3 + ["ab"] * 2, n_merges=1)
    assert tok.merges[0] == ("a", "b")
    assert tok.encode_word("abab") == ["ab", "ab", END]


def test_save_load_round_trip(tmp_path):
    tok = BpeTokenizer.train(CORPUS, n_merges=50)
    p = str(tmp_path / "merges.txt")
    tok.save(p)
    tok2 = BpeTokenizer.load(p)
    assert tok2.merges == tok.merges
    assert tok2.encode("alice almeida works at acme corp") == tok.encode(
        "alice almeida works at acme corp"
    )


def test_spark_udf_usage(spark):
    """The tokenizer pickles into a mapInPandas stage like the model."""
    import pandas as pd

    from gliner_spark.sources.synth import synth_docs

    tok = BpeTokenizer.train(CORPUS, n_merges=80)
    bc = spark.sparkContext.broadcast(tok)

    def fn(batches):
        t = bc.value
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                text = " ".join(s["text"] for s in spans if s["kind"] == "text")
                rows.append({"doc_id": doc_id, "n_subwords": len(t.encode(text))})
            yield pd.DataFrame(rows, columns=["doc_id", "n_subwords"])

    docs = synth_docs(spark, 50, partitions=4)
    got = {
        r.doc_id: r.n_subwords
        for r in docs.mapInPandas(fn, "doc_id string, n_subwords long").collect()
    }
    for i in (0, 7, 23):
        d = gen_doc(i)
        want = len(tok.encode(assembled_text(d["spans"])))
        assert got[d["doc_id"]] == want
