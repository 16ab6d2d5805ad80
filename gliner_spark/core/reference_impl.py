"""Single-process reference pipeline (the parity oracle).

Runs the exact per-document path the reference runs — prepare, score,
decode, relation pairs (gliner/model.py:2253-2331 + 3959-4228) — as a plain
Python loop with no Spark. The distributed pipeline must reproduce this
output exactly (triple P/R >= 0.95 gate is measured against it AND against
planted gold).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from gliner_spark.core.model import GlinerSparkModel, normalize_surface
from gliner_spark.sources.synth import assembled_text


def run_reference(
    docs: List[dict], model: GlinerSparkModel
) -> Tuple[List[dict], List[dict]]:
    """docs: [{'doc_id', 'spans'}] -> (mention rows, raw triple rows).

    Triples use normalized surface forms for subj/obj (canonicalization is a
    separate downstream stage in both pipelines).
    """
    cache: Dict = {}
    mention_rows: List[dict] = []
    triple_rows: List[dict] = []
    for doc in docs:
        text = assembled_text(doc["spans"])
        mentions, tokens, _, _ = model.predict_doc(text, cache)
        for k, m in enumerate(mentions):
            mention_rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "ent_idx": k,
                    "start": m["start"],
                    "end": m["end"],
                    "text": m["text"],
                    "label": m["label"],
                    "score": m["score"],
                }
            )
        rels = model.predict_relations_doc(tokens, mentions, cache)
        for r in rels:
            h, t = mentions[r["head_idx"]], mentions[r["tail_idx"]]
            triple_rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "subj": normalize_surface(h["text"]),
                    "pred": r["relation"],
                    "obj": normalize_surface(t["text"]),
                    "subj_type": h["label"],
                    "obj_type": t["label"],
                    "score": r["score"],
                }
            )
        # media spans participate as objects: (first mention, depicts, ref)
        if mentions:
            anchor = mentions[0]
            for sp in doc["spans"]:
                if sp["kind"] == "media":
                    triple_rows.append(
                        {
                            "doc_id": doc["doc_id"],
                            "subj": normalize_surface(anchor["text"]),
                            "pred": "depicts",
                            "obj": sp["media_ref"],
                            "subj_type": anchor["label"],
                            "obj_type": "media",
                            "score": 1.0,
                        }
                    )
    return mention_rows, triple_rows
