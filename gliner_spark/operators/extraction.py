"""Stage 1+2: mention + raw-triple extraction as ONE mapInPandas pass.

Mirrors the reference's relex forward, which emits entities and relations in
a single model pass (gliner/modeling/base.py:2256-2495, decoder.py:1121-93):
per document there is zero cross-document communication (SURVEY §3.3), so
the whole neural stage is embarrassingly parallel — one Arrow-vectorized
UDF, no shuffle, no second scan of the corpus for relations.

The model object is broadcast once per job (the reference's frozen-prompt
mode, model.py:2455-2541, proves label embeddings can be precomputed and
reused for every batch — our broadcast variable is exactly that).

Scale notes (100 TB):
- input scan only reads (doc_id, spans) — column pruning reaches parquet;
- optional repartition by hash(doc_id) balances Arrow batches when the
  upstream layout is skewed by document size;
- output is nested per doc (mentions[], triples[]) then exploded — explode
  is narrow (no shuffle).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gliner_spark.core.model import GlinerSparkModel, normalize_surface

GRAPH_DDL = (
    "doc_id string, "
    "span_fp string, "
    "mentions array<struct<ent_idx:int,start:int,end:int,text:string,"
    "label:string,score:double,norm:string>>, "
    "triples array<struct<subj:string,pred:string,obj:string,"
    "subj_type:string,obj_type:string,score:double>>"
)


def _span_fp_bytes(kind, text, ref) -> bytes:
    """THE single per-span byte encoding behind span_fp — shared by the
    dict/Row path (span_fingerprint) and the flat-array Arrow path so the
    resume/lineage invariant can never silently diverge between them
    (r5 review finding)."""
    return f"{kind}\x00{text}\x00{ref or ''}\x01".encode("utf-8")


def span_fingerprint(spans) -> str:
    """Order-sensitive fingerprint of the (kind, text, media_ref) sequence —
    the per-row invariant the pipeline must preserve (input_hint)."""
    h = hashlib.blake2b(digest_size=16)
    for sp in spans:
        kind = sp["kind"] if isinstance(sp, dict) else sp.kind
        text = sp["text"] if isinstance(sp, dict) else sp.text
        ref = sp["media_ref"] if isinstance(sp, dict) else sp.media_ref
        h.update(_span_fp_bytes(kind, text, ref))
    return h.hexdigest()


def _process_batches(bc_model, labels=None):
    """Returns the mapInPandas function. `bc_model` is an explicit
    sc.broadcast handle: the pickled model ships to each executor ONCE (not
    per task-closure), which is what matters when the weights are a real
    100MB+ encoder; the sigmoid gather tables are materialized lazily per
    process. `labels` restricts extraction to a per-run label subset
    (zero-shot selection, reference predict_entities model.py:2333)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc_model.value
        for pdf in batches:
            out_rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                spans = list(spans)
                text = " ".join(
                    sp["text"] for sp in spans if sp["kind"] == "text"
                )
                mentions, tokens, _, _ = model.predict_doc(text, labels=labels)
                rels = model.predict_relations_doc(tokens, mentions)
                m_rows = [
                    {
                        "ent_idx": k,
                        "start": m["start"],
                        "end": m["end"],
                        "text": m["text"],
                        "label": m["label"],
                        "score": m["score"],
                        "norm": normalize_surface(m["text"]),
                    }
                    for k, m in enumerate(mentions)
                ]
                t_rows = [
                    {
                        "subj": m_rows[r["head_idx"]]["norm"],
                        "pred": r["relation"],
                        "obj": m_rows[r["tail_idx"]]["norm"],
                        "subj_type": m_rows[r["head_idx"]]["label"],
                        "obj_type": m_rows[r["tail_idx"]]["label"],
                        "score": r["score"],
                    }
                    for r in rels
                ]
                if m_rows:  # media spans participate as triple objects
                    anchor = m_rows[0]
                    for sp in spans:
                        if sp["kind"] == "media":
                            t_rows.append(
                                {
                                    "subj": anchor["norm"],
                                    "pred": "depicts",
                                    "obj": sp["media_ref"],
                                    "subj_type": anchor["label"],
                                    "obj_type": "media",
                                    "score": 1.0,
                                }
                            )
                out_rows.append(
                    {
                        "doc_id": doc_id,
                        "span_fp": span_fingerprint(spans),
                        "mentions": m_rows,
                        "triples": t_rows,
                    }
                )
            yield pd.DataFrame(
                out_rows, columns=["doc_id", "span_fp", "mentions", "triples"]
            )

    return fn


def _graph_arrow_types():
    import pyarrow as pa

    mention_t = pa.struct(
        [
            ("ent_idx", pa.int32()), ("start", pa.int32()),
            ("end", pa.int32()), ("text", pa.string()),
            ("label", pa.string()), ("score", pa.float64()),
            ("norm", pa.string()),
        ]
    )
    triple_t = pa.struct(
        [
            ("subj", pa.string()), ("pred", pa.string()),
            ("obj", pa.string()), ("subj_type", pa.string()),
            ("obj_type", pa.string()), ("score", pa.float64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.string()), ("span_fp", pa.string()),
            ("mentions", pa.list_(mention_t)),
            ("triples", pa.list_(triple_t)),
        ]
    )
    return mention_t, triple_t, out_schema


class _GraphBatchAccum:
    """Per-batch columnar accumulator for the mentions+triples pass:
    every output value is appended to a flat python list and the nested
    mentions[]/triples[] columns are built ONCE per batch as pyarrow
    ListArray(StructArray) via offsets — no per-row dicts, no pandas
    block manager. Shared by the Arrow-docs path (_graph_arrow_fn) and
    the fused synth+extract path (synth_extract_graph) so the two can
    never drift (values bit-identical to the row path —
    test_arrow_graph_parity)."""

    def __init__(self, model, labels=None):
        self.model = model
        self.labels = labels
        self.o_doc, self.o_fp = [], []
        self.m_off = [0]
        self.m_idx, self.m_s, self.m_e = [], [], []
        self.m_text, self.m_label, self.m_score, self.m_norm = [], [], [], []
        self.t_off = [0]
        self.t_subj, self.t_pred, self.t_obj = [], [], []
        self.t_st, self.t_ot, self.t_sc = [], [], []

    def add_doc(self, doc_id, kinds, texts, refs):
        """kinds/texts/refs: the doc's span fields, in span order."""
        import hashlib

        text = " ".join(
            t for kd, t in zip(kinds, texts) if kd == "text"
        )
        mentions, tokens, _, _ = self.model.predict_doc(
            text, labels=self.labels
        )
        rels = self.model.predict_relations_doc(tokens, mentions)
        norms, labs = [], []
        for k, m in enumerate(mentions):
            n = normalize_surface(m["text"])
            self.m_idx.append(k)
            self.m_s.append(m["start"])
            self.m_e.append(m["end"])
            self.m_text.append(m["text"])
            self.m_label.append(m["label"])
            self.m_score.append(m["score"])
            self.m_norm.append(n)
            norms.append(n)
            labs.append(m["label"])
        self.m_off.append(len(self.m_idx))
        for r in rels:
            self.t_subj.append(norms[r["head_idx"]])
            self.t_pred.append(r["relation"])
            self.t_obj.append(norms[r["tail_idx"]])
            self.t_st.append(labs[r["head_idx"]])
            self.t_ot.append(labs[r["tail_idx"]])
            self.t_sc.append(r["score"])
        if norms:  # media spans participate as triple objects
            for kd, ref in zip(kinds, refs):
                if kd == "media":
                    self.t_subj.append(norms[0])
                    self.t_pred.append("depicts")
                    self.t_obj.append(ref)
                    self.t_st.append(labs[0])
                    self.t_ot.append("media")
                    self.t_sc.append(1.0)
        self.t_off.append(len(self.t_subj))
        self.o_doc.append(doc_id)
        # identical bytes to span_fingerprint() over dict rows —
        # _span_fp_bytes is the single shared encoding
        h = hashlib.blake2b(digest_size=16)
        for kd, t, ref in zip(kinds, texts, refs):
            h.update(_span_fp_bytes(kd, t, ref))
        self.o_fp.append(h.hexdigest())

    def finish(self):
        import pyarrow as pa

        mention_t, triple_t, out_schema = _graph_arrow_types()
        mentions_arr = pa.ListArray.from_arrays(
            pa.array(self.m_off, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(self.m_idx, pa.int32()),
                    pa.array(self.m_s, pa.int32()),
                    pa.array(self.m_e, pa.int32()),
                    pa.array(self.m_text, pa.string()),
                    pa.array(self.m_label, pa.string()),
                    pa.array(self.m_score, pa.float64()),
                    pa.array(self.m_norm, pa.string()),
                ],
                fields=list(mention_t),
            ),
        )
        triples_arr = pa.ListArray.from_arrays(
            pa.array(self.t_off, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(self.t_subj, pa.string()),
                    pa.array(self.t_pred, pa.string()),
                    pa.array(self.t_obj, pa.string()),
                    pa.array(self.t_st, pa.string()),
                    pa.array(self.t_ot, pa.string()),
                    pa.array(self.t_sc, pa.float64()),
                ],
                fields=list(triple_t),
            ),
        )
        return pa.RecordBatch.from_arrays(
            [
                pa.array(self.o_doc, pa.string()),
                pa.array(self.o_fp, pa.string()),
                mentions_arr,
                triples_arr,
            ],
            schema=out_schema,
        )


def _graph_arrow_fn(bc_model, labels=None):
    """Columnar (mapInArrow) inner loop for the flagship mentions+triples
    pass (VERDICT r4 ask #1). Per-doc model calls are unchanged — greedy
    decode is inherently per-doc; output assembly lives in
    _GraphBatchAccum (shared with the fused synth path)."""
    import pyarrow.compute as pc  # explicit: pa.compute is NOT auto-loaded

    def fn(batches):
        model = bc_model.value
        for rb in batches:
            doc_ids = rb.column(rb.schema.get_field_index("doc_id"))
            spans_col = rb.column(rb.schema.get_field_index("spans"))
            # columnar INPUT access too: the nested span structs are read
            # as three flat child arrays + per-doc lengths — no per-span
            # python dicts are ever built (to_pylist on a list<struct>
            # column was a measurable slice of batch time)
            lengths = [
                v.as_py() for v in pc.list_value_length(spans_col)
            ]
            flat = spans_col.flatten()
            kinds = flat.field("kind").to_pylist()
            texts = flat.field("text").to_pylist()
            refs = flat.field("media_ref").to_pylist()
            acc = _GraphBatchAccum(model, labels=labels)
            pos = 0
            for doc_id, n_spans in zip(doc_ids.to_pylist(), lengths):
                lo, hi = pos, pos + (n_spans or 0)
                pos = hi
                acc.add_doc(
                    doc_id, kinds[lo:hi], texts[lo:hi], refs[lo:hi]
                )
            yield acc.finish()

    return fn


def synth_extract_graph(
    spark,
    n_docs: int,
    model: GlinerSparkModel,
    seed: int = 42,
    partitions: int = 32,
    labels=None,
) -> DataFrame:
    """Fused corpus synthesis + extraction (r7, guide §4.1): ONE
    mapInArrow over spark.range ids runs gen_doc AND the model forward
    per document, so the synthetic spans never cross the Python->JVM->
    Python boundary between a synth stage and an extract stage — the
    rows are identical to extract_graph(synth_docs(...), model) by
    construction (same gen_doc, same _GraphBatchAccum assembly; parity
    test + every kg_* oracle gate). range(0, n, 1, partitions) replaces
    synth_docs' round-robin repartition: one fewer exchange, identical
    row multiset (every doc is a pure function of its id)."""
    from gliner_spark.sources.synth import gen_doc

    bc = spark.sparkContext.broadcast(model)

    def fn(batches):
        model_v = bc.value
        for rb in batches:
            acc = _GraphBatchAccum(model_v, labels=labels)
            for i in rb.column(0).to_pylist():
                d = gen_doc(int(i), seed)
                spans = d["spans"]
                acc.add_doc(
                    d["doc_id"],
                    [sp["kind"] for sp in spans],
                    [sp["text"] for sp in spans],
                    [sp["media_ref"] for sp in spans],
                )
            yield acc.finish()

    rng = (
        spark.range(0, n_docs, 1, partitions)
        if partitions
        else spark.range(n_docs)
    )
    return rng.mapInArrow(fn, schema=GRAPH_DDL)


def extract_graph(
    docs: DataFrame,
    model: GlinerSparkModel,
    length_sorted: bool = False,
    labels=None,
    use_arrow: bool = True,
) -> DataFrame:
    """docs(doc_id, spans) -> nested per-doc graph rows (GRAPH_DDL).

    use_arrow (default, r5): the flagship runs the mapInArrow columnar
    inner loop (_graph_arrow_fn) — identical rows to the mapInPandas row
    path (kept as use_arrow=False for the A/B bench tool and the parity
    test), measured faster because mention/triple cells skip per-row dicts
    and the pandas block manager.

    length_sorted: range-partition by document size before scoring — the
    Spark analog of the reference's sequence packing (infer_packing.py:
    164-326): co-locating similar-length docs makes Arrow batches uniform,
    which matters when the encoder pads to the batch max (a transformer on
    GPU executors). The deterministic stand-in does per-doc work with no
    padding, so this is measured ~neutral here (BENCH.md) and OFF by
    default; it costs one shuffle.
    """
    cfg = model.config
    bc = docs.sparkSession.sparkContext.broadcast(model)
    src = docs.select("doc_id", "spans")  # column pruning to the scan
    if length_sorted:
        src = src.withColumn(
            "_len",
            F.aggregate(
                F.transform("spans", lambda s: F.length(s["text"])),
                F.lit(0),
                lambda a, x: a + x,
            ),
        ).repartitionByRange(cfg.shuffle_partitions, "_len").drop("_len")
    elif cfg.doc_partitions:
        src = src.repartition(cfg.doc_partitions, "doc_id")
    if use_arrow:
        return src.mapInArrow(
            _graph_arrow_fn(bc, labels=labels), schema=GRAPH_DDL
        )
    return src.mapInPandas(_process_batches(bc, labels=labels), schema=GRAPH_DDL)


def _synth_range(spark, n_docs: int, partitions: int):
    """spark.range source for the fused synth+X operators: contiguous id
    ranges per partition (one fewer exchange than synth_docs' round-robin
    repartition; identical row multiset — every doc is a pure function of
    its id)."""
    return (
        spark.range(0, n_docs, 1, partitions)
        if partitions
        else spark.range(n_docs)
    )


def _synth_doc_texts(pdf, seed: int):
    """(doc_id, assembled_text) per range id — the shared per-batch input
    iterator of the fused mapInPandas operators."""
    from gliner_spark.sources.synth import gen_doc

    for i in pdf["id"]:
        d = gen_doc(int(i), seed)
        yield d["doc_id"], " ".join(
            sp["text"] for sp in d["spans"] if sp["kind"] == "text"
        )


MENTIONS_DDL = (
    "doc_id string, ent_idx int, start int, end int, text string, "
    "label string, score double, norm string"
)


def extract_mentions_only(
    docs: DataFrame, model: GlinerSparkModel, labels=None
) -> DataFrame:
    """NER-only mode with an optional per-request label subset — the
    zero-shot surface (labels chosen at query time, reference
    predict_entities model.py:2333 + make_mapping utils.py:182-212).
    Flat mention rows, no relation pass."""
    bc = docs.sparkSession.sparkContext.broadcast(model)

    def fn(batches):
        model = bc.value
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                text = " ".join(
                    sp["text"] for sp in spans if sp["kind"] == "text"
                )
                mentions, _, _, _ = model.predict_doc(text, labels=labels)
                for k, m in enumerate(mentions):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "ent_idx": k,
                            "start": m["start"],
                            "end": m["end"],
                            "text": m["text"],
                            "label": m["label"],
                            "score": m["score"],
                            "norm": normalize_surface(m["text"]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "ent_idx", "start", "end", "text", "label",
                    "score", "norm",
                ],
            )

    return docs.select("doc_id", "spans").mapInPandas(fn, schema=MENTIONS_DDL)


def synth_extract_mentions_only(
    spark, n_docs: int, model: GlinerSparkModel, labels=None,
    seed: int = 42, partitions: int = 32,
) -> DataFrame:
    """Fused synth + NER-only extraction (r7): same rows as
    extract_mentions_only(synth_docs(...)) without the synth stage's
    Python->JVM->Python round trip."""
    bc = spark.sparkContext.broadcast(model)

    def fn(batches):
        m = bc.value
        for pdf in batches:
            rows = []
            for doc_id, text in _synth_doc_texts(pdf, seed):
                mentions, _, _, _ = m.predict_doc(text, labels=labels)
                for k, mn in enumerate(mentions):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "ent_idx": k,
                            "start": mn["start"],
                            "end": mn["end"],
                            "text": mn["text"],
                            "label": mn["label"],
                            "score": mn["score"],
                            "norm": normalize_surface(mn["text"]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "ent_idx", "start", "end", "text", "label",
                    "score", "norm",
                ],
            )

    return _synth_range(spark, n_docs, partitions).mapInPandas(
        fn, schema=MENTIONS_DDL
    )


DENSE_SPANS_DDL = (
    "doc_id string, word_start int, word_end int, label string, score double"
)

# driver-side registry of shipped checkpoint basenames (collision guard)
_SHIPPED_CKPTS: dict = {}


def _ship_checkpoint(sc, ckpt_path) -> str:
    """sc.addFile a checkpoint npz with the basename-collision guard;
    returns the SparkFiles basename executors load by.

    SparkFiles keys executor files (and our per-worker cache) by BASENAME:
    two different checkpoints sharing a basename within one APPLICATION
    would silently serve the first one's weights — the registry key
    includes applicationId so a fresh SparkContext (fresh SparkFiles
    state) never trips a stale-process collision."""
    import os as _os

    path = _os.path.abspath(str(ckpt_path))
    name = _os.path.basename(path)
    reg_key = (sc.applicationId, name)
    prev = _SHIPPED_CKPTS.get(reg_key)
    if prev is not None and prev != path:
        raise ValueError(
            f"checkpoint basename collision: {name!r} already shipped "
            f"from {prev!r} in this application; rename {path!r} "
            "(SparkFiles is basename-keyed per application)"
        )
    _SHIPPED_CKPTS[reg_key] = path
    sc.addFile(path)
    return name


def extract_spans_dense(docs: DataFrame, ckpt) -> DataFrame:
    """Dense-encoder scoring stage: embedding lookup -> SpanMarkerV0 ->
    prompt matmul -> sigmoid >= threshold (core/dense.py; reference
    span_rep.py:464-511 + base.py:474). Emits the scored span grid — the
    decode stage is shared with the gather path and gated separately.

    ckpt is either a DenseCheckpoint (ships via explicit ``sc.broadcast``:
    once per executor, not per task) or a PATH to an .npz checkpoint file,
    which ships via ``sc.addFile`` and is lazy-loaded + cached per executor
    python worker (core/dense.load_checkpoint_sparkfile) — the seam a real
    exported GLiNER weight file drops into without re-pickling the arrays
    through the broadcast block store. One mapInPandas, zero shuffle,
    (doc_id, spans)-pruned scan — same plan shape as extract_graph.
    """
    import os as _os

    from gliner_spark.core.dense import (
        load_checkpoint_sparkfile,
        predict_spans_dense,
    )

    if isinstance(ckpt, (str, _os.PathLike)):
        name = _ship_checkpoint(docs.sparkSession.sparkContext, ckpt)

        def get_ckpt():
            return load_checkpoint_sparkfile(name)
    else:
        bc = docs.sparkSession.sparkContext.broadcast(ckpt)

        def get_ckpt():
            return bc.value

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = get_ckpt()
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                text = " ".join(
                    sp["text"] for sp in spans if sp["kind"] == "text"
                )
                for m in predict_spans_dense(text, w):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "word_start": m["word_start"],
                            "word_end": m["word_end"],
                            "label": m["label"],
                            "score": m["score"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "word_start", "word_end", "label", "score"],
            )

    return docs.select("doc_id", "spans").mapInPandas(
        fn, schema=DENSE_SPANS_DDL
    )


def synth_extract_spans_dense(
    spark, n_docs: int, ckpt, seed: int = 42, partitions: int = 32
) -> DataFrame:
    """Fused synth + dense-encoder scoring (r7): same rows as
    extract_spans_dense(synth_docs(...), ckpt) without the synth stage's
    Python->JVM->Python round trip."""
    import os as _os

    from gliner_spark.core.dense import (
        load_checkpoint_sparkfile,
        predict_spans_dense,
    )

    if isinstance(ckpt, (str, _os.PathLike)):
        name = _ship_checkpoint(spark.sparkContext, ckpt)

        def get_ckpt():
            return load_checkpoint_sparkfile(name)
    else:
        bc = spark.sparkContext.broadcast(ckpt)

        def get_ckpt():
            return bc.value

    def fn(batches):
        w = get_ckpt()
        for pdf in batches:
            rows = []
            for doc_id, text in _synth_doc_texts(pdf, seed):
                for m in predict_spans_dense(text, w):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "word_start": m["word_start"],
                            "word_end": m["word_end"],
                            "label": m["label"],
                            "score": m["score"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "word_start", "word_end", "label", "score"],
            )

    return _synth_range(spark, n_docs, partitions).mapInPandas(
        fn, schema=DENSE_SPANS_DDL
    )


def extract_spans_encoder(docs: DataFrame, ckpt_path) -> DataFrame:
    """Scored span grid through the pluggable `SpanEncoder` BACKEND
    protocol (core/encoders.py) — the seam a real trained GLiNER drops
    into (reference model.py:639-691 load path; encoder.py:868-879 word
    vectors). The executor-side python worker builds
    SpanEncoder(DenseCheckpointBackend(ckpt)) from a SparkFiles-shipped
    npz, derives the mean-pooled label-prompt matrix through the protocol
    (encoders.SpanEncoder.encode_labels — reference label-encoder mean
    pooling, base.py:83-121), and scores each doc with
    SpanEncoder.score_text. Output contract and math are identical to
    extract_spans_dense (tests/test_encoders_seam.py proves the adapter
    bit-equal to core/dense.score_doc_dense), so the kg_mentions_dense
    oracle gates this path too — swapping in a torch/ONNX backend touches
    ZERO Spark code. Same plan shape: one mapInPandas, zero shuffle,
    (doc_id, spans)-pruned scan."""
    import numpy as np

    name = _ship_checkpoint(docs.sparkSession.sparkContext, ckpt_path)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gliner_spark.core.dense import load_checkpoint_sparkfile
        from gliner_spark.core.encoders import (
            DenseCheckpointBackend,
            SpanEncoder,
        )

        ckpt = load_checkpoint_sparkfile(name)
        enc = SpanEncoder(DenseCheckpointBackend(ckpt))
        # label prompts via the protocol, once per python worker (a few
        # label strings — negligible next to the per-doc scoring)
        lm = enc.encode_labels(ckpt.labels)
        marker = ckpt.marker()
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                text = " ".join(
                    sp["text"] for sp in spans if sp["kind"] == "text"
                )
                span_idx, valid, probs = enc.score_text(
                    text, marker, lm, ckpt.scale, ckpt.bias, ckpt.max_width
                )
                if probs.size == 0:
                    continue
                # one vectorized mask instead of a nonzero per valid row
                # (row-major emission order unchanged)
                keep = valid[:, None] & (probs >= ckpt.threshold)
                for i, c in zip(*np.nonzero(keep)):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "word_start": int(span_idx[i, 0]),
                            "word_end": int(span_idx[i, 1]),
                            "label": ckpt.labels[int(c)],
                            "score": float(probs[i, c]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "word_start", "word_end", "label", "score"],
            )

    return docs.select("doc_id", "spans").mapInPandas(
        fn, schema=DENSE_SPANS_DDL
    )


def synth_extract_spans_encoder(
    spark, n_docs: int, ckpt_path, seed: int = 42, partitions: int = 32
) -> DataFrame:
    """Fused synth + SpanEncoder-backend scoring (r7): same rows as
    extract_spans_encoder(synth_docs(...), ckpt_path) without the synth
    stage's Python->JVM->Python round trip."""
    import numpy as np

    name = _ship_checkpoint(spark.sparkContext, ckpt_path)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gliner_spark.core.dense import load_checkpoint_sparkfile
        from gliner_spark.core.encoders import (
            DenseCheckpointBackend,
            SpanEncoder,
        )

        ckpt = load_checkpoint_sparkfile(name)
        enc = SpanEncoder(DenseCheckpointBackend(ckpt))
        lm = enc.encode_labels(ckpt.labels)
        marker = ckpt.marker()
        for pdf in batches:
            rows = []
            for doc_id, text in _synth_doc_texts(pdf, seed):
                span_idx, valid, probs = enc.score_text(
                    text, marker, lm, ckpt.scale, ckpt.bias, ckpt.max_width
                )
                if probs.size == 0:
                    continue
                keep = valid[:, None] & (probs >= ckpt.threshold)
                for i, c in zip(*np.nonzero(keep)):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "word_start": int(span_idx[i, 0]),
                            "word_end": int(span_idx[i, 1]),
                            "label": ckpt.labels[int(c)],
                            "score": float(probs[i, c]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "word_start", "word_end", "label", "score"],
            )

    return _synth_range(spark, n_docs, partitions).mapInPandas(
        fn, schema=DENSE_SPANS_DDL
    )


def extract_mentions_arrow(
    docs: DataFrame, model: GlinerSparkModel, labels=None
) -> DataFrame:
    """Columnar variant of extract_mentions_only: mapInArrow consumes and
    emits pyarrow RecordBatches directly — output columns are appended to
    flat python lists and built once per batch (no per-row dicts, no
    pandas block manager). Same rows, measured ~1.3-1.5x the row-path
    throughput (tools/bench_arrow_ab.py)."""
    import pyarrow as pa

    bc = docs.sparkSession.sparkContext.broadcast(model)
    out_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("ent_idx", pa.int32()),
            ("start", pa.int32()),
            ("end", pa.int32()),
            ("text", pa.string()),
            ("label", pa.string()),
            ("score", pa.float64()),
            ("norm", pa.string()),
        ]
    )

    def fn(batches):
        model = bc.value
        for rb in batches:
            doc_ids = rb.column(rb.schema.get_field_index("doc_id"))
            spans_col = rb.column(rb.schema.get_field_index("spans"))
            o_doc, o_idx, o_s, o_e = [], [], [], []
            o_text, o_label, o_score, o_norm = [], [], [], []
            for doc_id, spans in zip(doc_ids.to_pylist(), spans_col.to_pylist()):
                text = " ".join(
                    sp["text"] for sp in spans if sp["kind"] == "text"
                )
                mentions, _, _, _ = model.predict_doc(text, labels=labels)
                for k, m in enumerate(mentions):
                    o_doc.append(doc_id)
                    o_idx.append(k)
                    o_s.append(m["start"])
                    o_e.append(m["end"])
                    o_text.append(m["text"])
                    o_label.append(m["label"])
                    o_score.append(m["score"])
                    o_norm.append(normalize_surface(m["text"]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_doc, pa.string()),
                    pa.array(o_idx, pa.int32()),
                    pa.array(o_s, pa.int32()),
                    pa.array(o_e, pa.int32()),
                    pa.array(o_text, pa.string()),
                    pa.array(o_label, pa.string()),
                    pa.array(o_score, pa.float64()),
                    pa.array(o_norm, pa.string()),
                ],
                schema=out_schema,
            )

    return docs.select("doc_id", "spans").mapInArrow(fn, schema=MENTIONS_DDL)


TRIPLES_SPANS_DDL = (
    "doc_id string, subj string, pred string, obj string, "
    "h_ws int, h_we int, t_ws int, t_we int, score double"
)


def extract_triples_with_spans(docs: DataFrame, model: GlinerSparkModel) -> DataFrame:
    """Relation triples annotated with head/tail WORD spans — the input the
    relex word-span evaluator matches on (reference evaluator.py:210-255:
    exact (rel_label, h_span, t_span) tuples). Text relations only (media
    'depicts' triples carry no spans). Same single-pass UDF shape as
    extract_graph."""
    bc = docs.sparkSession.sparkContext.broadcast(model)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc.value
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                text = " ".join(
                    sp["text"] for sp in spans if sp["kind"] == "text"
                )
                mentions, tokens, _, _ = model.predict_doc(text)
                for r in model.predict_relations_doc(tokens, mentions):
                    h, t = mentions[r["head_idx"]], mentions[r["tail_idx"]]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "subj": normalize_surface(h["text"]),
                            "pred": r["relation"],
                            "obj": normalize_surface(t["text"]),
                            "h_ws": h["word_start"],
                            "h_we": h["word_end"],
                            "t_ws": t["word_start"],
                            "t_we": t["word_end"],
                            "score": r["score"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "subj", "pred", "obj",
                    "h_ws", "h_we", "t_ws", "t_we", "score",
                ],
            )

    return docs.select("doc_id", "spans").mapInPandas(
        fn, schema=TRIPLES_SPANS_DDL
    )


def synth_extract_triples_with_spans(
    spark, n_docs: int, model: GlinerSparkModel,
    seed: int = 42, partitions: int = 32,
) -> DataFrame:
    """Fused synth + word-span triple extraction (r7): same rows as
    extract_triples_with_spans(synth_docs(...), model) without the synth
    stage's Python->JVM->Python round trip."""
    bc = spark.sparkContext.broadcast(model)

    def fn(batches):
        m = bc.value
        for pdf in batches:
            rows = []
            for doc_id, text in _synth_doc_texts(pdf, seed):
                mentions, tokens, _, _ = m.predict_doc(text)
                for r in m.predict_relations_doc(tokens, mentions):
                    h, t = mentions[r["head_idx"]], mentions[r["tail_idx"]]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "subj": normalize_surface(h["text"]),
                            "pred": r["relation"],
                            "obj": normalize_surface(t["text"]),
                            "h_ws": h["word_start"],
                            "h_we": h["word_end"],
                            "t_ws": t["word_start"],
                            "t_we": t["word_end"],
                            "score": r["score"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "subj", "pred", "obj",
                    "h_ws", "h_we", "t_ws", "t_we", "score",
                ],
            )

    return _synth_range(spark, n_docs, partitions).mapInPandas(
        fn, schema=TRIPLES_SPANS_DDL
    )


def mentions_table(graph: DataFrame) -> DataFrame:
    """Explode to the mentions schema (FIXTURES.md §4)."""
    return graph.select(
        "doc_id", F.explode("mentions").alias("m")
    ).select(
        "doc_id",
        F.col("m.ent_idx").alias("ent_idx"),
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
        F.col("m.text").alias("text"),
        F.col("m.label").alias("label"),
        F.col("m.score").alias("score"),
        F.col("m.norm").alias("norm"),
    )


def triples_raw_table(graph: DataFrame) -> DataFrame:
    """Explode to raw (surface-form) triples."""
    return graph.select(
        "doc_id", F.explode("triples").alias("t")
    ).select("doc_id", "t.*")
