"""Oracle fixture snapshots: make the KG extraction SQL-checkable.

The synthetic corpus is a pure function of (seed, doc_index), so the SQL
oracle can be given the SAME input the Spark query consumes: this module
materializes (with pyarrow, no Spark) the assembled doc texts, per-doc
media refs, the gazetteer and the relation-pattern table as parquet files
under a deterministic path. The DuckDB oracle then re-derives mentions and
raw triples INDEPENDENTLY — pure SQL over token positions and surface
joins — and the driver's value-hash compares it against the distributed
pipeline. This upgrades the flagship extraction queries from rows-only to
fully oracle-gated.

Soundness note: exact surface matching == the model's scoring on this
corpus because (a) candidate spans score above threshold iff their surface
is a gazetteer entry (basis construction, core/model.py) and (b) the synth
vocabulary guarantees gazetteer matches never overlap, so greedy
non-overlap selection keeps exactly the match set. Both facts are
unit-tested (test_model_finds_planted_gold_exactly).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from gliner_spark.sources import vocab
from gliner_spark.sources.synth import assembled_text, gen_doc

BASE = "/tmp/gliner_spark_oracle"


def materialize(n_docs: int, seed: int = 42) -> str:
    """Write (or reuse) the snapshot for an n_docs corpus; returns its dir."""
    out = os.path.join(BASE, f"docs_{n_docs}_seed{seed}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    doc_ids, texts = [], []
    m_doc, m_ref, m_cap = [], [], []
    g_doc, g_start, g_end, g_label = [], [], [], []
    for i in range(n_docs):
        d = gen_doc(i, seed)
        doc_ids.append(d["doc_id"])
        texts.append(assembled_text(d["spans"]))
        for sp in d["spans"]:
            if sp["kind"] == "media":
                m_doc.append(d["doc_id"])
                m_ref.append(sp["media_ref"])
                m_cap.append(sp["text"])
        for g in d["gold_mentions"]:
            g_doc.append(d["doc_id"])
            g_start.append(g["start"])
            g_end.append(g["end"])
            g_label.append(g["label"])
    pq.write_table(
        pa.table({"doc_id": doc_ids, "text": texts}),
        os.path.join(out, "docs_text.parquet"),
    )
    pq.write_table(
        pa.table({"doc_id": m_doc, "media_ref": m_ref, "caption": m_cap}),
        os.path.join(out, "media.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": g_doc,
                "start": pa.array(g_start, pa.int32()),
                "end": pa.array(g_end, pa.int32()),
                "label": g_label,
            }
        ),
        os.path.join(out, "gold_mentions.parquet"),
    )

    surf, lab = [], []
    for label, surfaces in vocab.GAZETTEER.items():
        for s in surfaces:
            surf.append(s)
            lab.append(label)
    pq.write_table(
        pa.table({"surface": surf, "label": lab}),
        os.path.join(out, "gazetteer.parquet"),
    )

    ph, rl = [], []
    for rel, phrases in vocab.REL_PHRASES.items():
        for p in phrases:
            ph.append(p)
            rl.append(rel)
    pq.write_table(
        pa.table({"phrase": ph, "rel": rl}),
        os.path.join(out, "rel_patterns.parquet"),
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out


def _long_form(name: str, m, out: str) -> None:
    """Write a 2-D matrix as (i, j, val) long-form parquet — the relational
    shape the SQL oracle's matmul joins consume."""
    import numpy as np

    m = np.asarray(m)
    if m.ndim == 1:
        m = m[None, :]
    ii, jj = np.indices(m.shape)
    pq.write_table(
        pa.table(
            {
                "i": pa.array(ii.ravel(), pa.int32()),
                "j": pa.array(jj.ravel(), pa.int32()),
                "val": pa.array(m.ravel(), pa.float64()),
            }
        ),
        os.path.join(out, f"{name}.parquet"),
    )


def materialize_dense(ckpt, tag: str = "default") -> str:
    """Write the dense checkpoint's weights as relational parquet tables so
    the DuckDB oracle can re-run the forward pass (embedding lookup →
    SpanMarkerV0 → prompt matmul) as plain SQL joins/aggregates."""
    out = os.path.join(BASE, f"dense_{tag}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    _long_form("emb", ckpt.emb, out)            # i=bucket, j=dim
    _long_form("w_start", ckpt.w_start, out)
    _long_form("w_end", ckpt.w_end, out)
    _long_form("w_out", ckpt.w_out, out)
    _long_form("b_out", ckpt.b_out, out)        # i=0, j=dim
    pq.write_table(
        pa.table(
            {
                "label": ckpt.labels,
                "class_id": pa.array(range(len(ckpt.labels)), pa.int32()),
            }
        ),
        os.path.join(out, "labels.parquet"),
    )
    _long_form("label_matrix", ckpt.label_matrix, out)  # i=class_id, j=dim
    with open(marker, "w") as f:
        f.write("ok")
    return out
