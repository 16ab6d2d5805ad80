"""Prompt-based two-pass RE (reference GLiNERRelationExtractor,
multitask/relation_extraction.py:13-181): the chained NER->composite-label
pipeline must emit exactly the triples the single-step pair-scoring path
emits on this corpus (the two reference modes agree when the pair context
is the connective phrase)."""

from gliner_spark.presets import default_model
from gliner_spark.sources.synth import assembled_text, gen_doc, synth_docs

MODEL = default_model()


def _pairs_path(text):
    mentions, tokens, _, _ = MODEL.predict_doc(text)
    rels = MODEL.predict_relations_doc(tokens, mentions)
    return sorted(
        (
            mentions[r["head_idx"]]["text"],
            r["relation"],
            mentions[r["tail_idx"]]["text"],
            round(r["score"], 9),
        )
        for r in rels
    )


def _prompted_path(text):
    mentions, _, _, _ = MODEL.predict_doc(text)
    uniq = list(dict.fromkeys(m["text"] for m in mentions))
    comp = [f"{e} <> {r}" for r in MODEL.relations for e in uniq]
    return sorted(
        (x["source"], x["relation"], x["target"], round(x["score"], 9))
        for x in MODEL.predict_doc_composite(text, comp)
    )


def test_two_pass_matches_pair_scoring_single_process():
    for i in range(200):
        text = assembled_text(gen_doc(i)["spans"])
        assert _prompted_path(text) == _pairs_path(text), i


def test_composite_label_parsing_edge_cases():
    text = assembled_text(gen_doc(1)["spans"])
    # malformed labels are skipped, not crashed on
    out = MODEL.predict_doc_composite(
        text, ["no-separator", " <> works_at", "alice almeida <> not_a_rel"]
    )
    assert out == []


def test_spark_prompted_matches_single_process(spark):
    from gliner_spark.operators.prompted_re import extract_relations_prompted

    n = 150
    docs = synth_docs(spark, n, partitions=8)
    got = sorted(
        map(tuple, extract_relations_prompted(docs, MODEL).collect())
    )
    expect = []
    for i in range(n):
        d = gen_doc(i)
        text = assembled_text(d["spans"])
        mentions, _, _, _ = MODEL.predict_doc(text)
        uniq = list(dict.fromkeys(m["text"] for m in mentions))
        comp = [f"{e} <> {r}" for r in MODEL.relations for e in uniq]
        for x in MODEL.predict_doc_composite(text, comp):
            expect.append(
                (d["doc_id"], x["source"], x["relation"], x["target"],
                 x["score"], x["start"], x["end"])
            )
    assert got == sorted(expect)
