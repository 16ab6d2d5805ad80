"""Reference-parity feature tests: per-request label subsets, input-span
masks, per-sample thresholds, top-k class probs, nested/multi-label modes,
evaluate() harness, char->word conversion, streaming extraction."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gliner_spark.presets import default_model
from gliner_spark.sources.synth import assembled_text, gen_doc, synth_docs

MODEL = default_model()


def _text(i=0):
    return assembled_text(gen_doc(i)["spans"])


# ---------------------------------------------------- per-request labels --
def test_label_subset_restricts_types():
    text = _text(0)  # has person+organization+date mentions
    all_m, *_ = MODEL.predict_doc(text)
    sub_m, *_ = MODEL.predict_doc(text, labels=["person"])
    assert {m["label"] for m in all_m} > {"person"}
    assert all(m["label"] == "person" for m in sub_m)
    # subset predictions = all-label predictions filtered to the subset
    want = [(m["start"], m["end"]) for m in all_m if m["label"] == "person"]
    got = [(m["start"], m["end"]) for m in sub_m]
    assert got == want


def test_label_subset_equals_postfilter_many_docs():
    """Restrict-before-predict == predict-all-then-filter across 200 docs
    (both suite seeds). Load-bearing for the shared-pass eval suite
    (ner_eval.evaluate_ner_suite applies zero-shot subsets as prediction
    post-filters — the oracle's definition); would diverge if greedy decode
    ever let an excluded-label span suppress an included one."""
    subset = ["person", "location"]
    for seed in (303, 404):
        for i in range(100):
            text = assembled_text(gen_doc(i, seed=seed)["spans"])
            a, *_ = MODEL.predict_doc(text, labels=subset)
            b_all, *_ = MODEL.predict_doc(text)
            b = [m for m in b_all if m["label"] in subset]
            assert sorted(map(repr, a)) == sorted(map(repr, b)), (seed, i)


def test_label_subset_order_preserving_dedup():
    text = _text(0)
    a, *_ = MODEL.predict_doc(text, labels=["person", "person", "date"])
    b, *_ = MODEL.predict_doc(text, labels=["person", "date"])
    assert a == b


# ---------------------------------------------------- input-span mask -----
def test_allowed_spans_restricts_scoring():
    text = _text(0)
    all_m, toks, _, _ = MODEL.predict_doc(text)
    first = all_m[0]
    allowed = [(first["word_start"], first["word_end"])]
    m, *_ = MODEL.predict_doc(text, allowed_spans=allowed)
    assert len(m) == 1 and m[0]["start"] == first["start"]
    m2, *_ = MODEL.predict_doc(text, allowed_spans=[])
    assert m2 == []


# ------------------------------------------------- per-sample threshold ---
def test_threshold_override():
    text = _text(0)
    base, *_ = MODEL.predict_doc(text)
    none_, *_ = MODEL.predict_doc(text, threshold=0.999)
    all_, *_ = MODEL.predict_doc(text, threshold=1e-12)
    assert none_ == [] and len(all_) >= len(base)


# ------------------------------------------------------ top-k probs -------
def test_top_k_class_probs():
    text = _text(0)
    m, *_ = MODEL.predict_doc(text, top_k_probs=3)
    assert m and all("class_probs" in x for x in m)
    for x in m:
        probs = list(x["class_probs"].values())
        assert probs == sorted(probs, reverse=True)
        assert x["label"] in x["class_probs"]
        assert abs(x["class_probs"][x["label"]] - x["score"]) < 1e-12


# --------------------------------------------------- nested / multilabel --
def test_nested_mode_via_config():
    from gliner_spark.config import PipelineConfig
    from gliner_spark.core.model import GlinerSparkModel

    cfg = PipelineConfig(dim=256, flat_ner=False, score_scale=24.0, score_bias=0.9)
    m = GlinerSparkModel.from_gazetteer(
        {"org": ["acme corp"], "place": ["acme corp tower"]}, {}, cfg
    )
    got, *_ = m.predict_doc("visit acme corp tower today")
    spans = {(x["label"], x["text"]) for x in got}
    assert spans == {("org", "acme corp"), ("place", "acme corp tower")}
    # flat mode keeps only one
    cfg_flat = PipelineConfig(dim=256, flat_ner=True, score_scale=24.0, score_bias=0.9)
    m2 = GlinerSparkModel.from_gazetteer(
        {"org": ["acme corp"], "place": ["acme corp tower"]}, {}, cfg_flat
    )
    got2, *_ = m2.predict_doc("visit acme corp tower today")
    assert len(got2) == 1


# ----------------------------------------------------- evaluate harness ---
def test_char_to_word_and_evaluate(spark):
    from gliner_spark.operators.ner_eval import char_to_word_ner, evaluate_ner

    docs = synth_docs(spark, 80, with_gold=True, partitions=4)
    with_text = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter("spans", lambda s: s.kind == "text"), lambda s: s.text
            ),
            " ",
        ).alias("text"),
        F.col("gold_mentions").alias("char_ner"),
    )
    eval_df = char_to_word_ner(with_text)
    # conversion sanity: word tokens re-join to the doc text
    row = eval_df.orderBy("doc_id").first()
    assert len(row.tokenized_text) > 0
    res = evaluate_ner(eval_df, MODEL).first()
    assert res.f1 == pytest.approx(1.0)
    assert res.n_pred == res.n_gold == res.tp


# ----------------------------------------------------------- streaming ----
def test_streaming_extraction_matches_batch(spark):
    from gliner_spark.operators.extraction import extract_graph
    from gliner_spark.streaming.pipeline import (
        run_stream_to_parquet,
        stream_extract,
        streaming_docs,
    )

    src = tempfile.mkdtemp(prefix="gs_stream_src_")
    out = tempfile.mkdtemp(prefix="gs_stream_out_")
    ckpt = tempfile.mkdtemp(prefix="gs_stream_ckpt_")
    try:
        docs = synth_docs(spark, 100, partitions=4)
        docs.write.mode("overwrite").parquet(src)
        stream = streaming_docs(spark, src)
        assert stream.isStreaming
        q = run_stream_to_parquet(stream_extract(stream, MODEL), out, ckpt)
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        want = extract_graph(spark.read.parquet(src), MODEL)
        a = sorted((r.doc_id, r.span_fp, str(r.mentions)) for r in got.collect())
        b = sorted((r.doc_id, r.span_fp, str(r.mentions)) for r in want.collect())
        assert a == b
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_incremental_graph_equals_batch(spark):
    """foreachBatch incremental ingestion + batch finalize == one-shot batch
    pipeline (entities and triples identical)."""
    import shutil as sh
    import tempfile as tf

    from gliner_spark.sinks.materialize import finalize_graph, run_pipeline
    from gliner_spark.streaming.pipeline import run_stream_pipeline

    src = tf.mkdtemp(prefix="gs_sp_src_")
    base_s = tf.mkdtemp(prefix="gs_sp_stream_")
    base_b = tf.mkdtemp(prefix="gs_sp_batch_")
    ckpt = tf.mkdtemp(prefix="gs_sp_ckpt_")
    try:
        docs = synth_docs(spark, 120, partitions=4)
        # two file drops -> at least two micro-batches (maxFilesPerTrigger=8
        # with 4+4 files still one trigger each availableNow pass; split
        # writes to force multiple input files)
        docs.filter(F.crc32("doc_id") % 2 == 0).write.mode("append").parquet(src)
        docs.filter(F.crc32("doc_id") % 2 == 1).write.mode("append").parquet(src)

        q = run_stream_pipeline(spark, src, base_s, MODEL, ckpt)
        q.awaitTermination(180)
        finalize_graph(spark, base_s, MODEL.config)

        run_pipeline(spark, docs, MODEL, base_b)

        for tbl in ["entities", "triples"]:
            a = spark.read.parquet(f"{base_s}/{tbl}")
            b = spark.read.parquet(f"{base_b}/{tbl}")
            assert a.count() == b.count(), tbl
            assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, tbl
    finally:
        for d in (src, base_s, base_b, ckpt):
            sh.rmtree(d, ignore_errors=True)
