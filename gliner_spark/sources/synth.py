"""Deterministic synthesis of interleaved text+media documents with
planted gold mentions/triples (FIXTURES.md §1).

Every document is a pure function of (seed, doc_index) via a counter-based
Philox generator, so generation is embarrassingly parallel: the Spark path
is ``spark.range(n) -> mapInPandas(gen batch)`` — no driver-side loop, no
collected state — and regenerating any doc anywhere yields identical bytes.
That is what makes the gold oracle usable at any scale without shipping
data: gold is recomputed, not stored.

Output schema (one row per doc):
  doc_id string,
  spans array<struct<kind,text,media_ref,offset>>,   -- the input_hint table
  gold_mentions array<struct<start,end,text,label>>, -- char offsets, end excl
  gold_triples array<struct<subj,pred,obj,subj_type,obj_type>>
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from numpy.random import Generator, Philox

from gliner_spark.sources import vocab

_TYPES = list(vocab.GAZETTEER.keys())
_SURFACES = {t: list(vocab.GAZETTEER[t]) for t in _TYPES}
_RELS = list(vocab.RELATION_PATTERNS.keys())


def _zipf_probs(n: int, a: float = 1.1) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), a)
    return p / p.sum()

_ZIPF = {t: _zipf_probs(len(s)) for t, s in _SURFACES.items()}
# inverse-CDF sampling: rng.choice(p=...) re-validates the probability
# vector on every call (~30us); searchsorted against the precomputed CDF is
# ~1us with the identical distribution. r7: bisect on the same CDF values
# (as python floats — bit-identical IEEE doubles, so the comparisons and
# hence the picked index are unchanged) drops the per-call numpy dispatch.
_ZIPF_CDF = {t: list(map(float, np.cumsum(p))) for t, p in _ZIPF.items()}

from bisect import bisect_right


def _pick(rng: Generator, etype: str) -> str:
    surfaces = _SURFACES[etype]
    i = bisect_right(_ZIPF_CDF[etype], rng.random())
    if i >= len(surfaces):
        i = len(surfaces) - 1
    return surfaces[i]


def gen_doc(i: int, seed: int = 42) -> dict:
    """Generate document i. Pure, deterministic, O(1) memory."""
    rng = Generator(Philox(key=np.array([seed, i], dtype=np.uint64)))
    n_segments = int(rng.integers(1, 5))       # text spans per doc
    n_media = int(rng.integers(0, 3))          # media spans per doc
    media_positions = set(
        int(p) for p in rng.choice(n_segments + 1, size=n_media, replace=False)
    )

    segments: List[str] = []          # text segment strings, in order
    seg_kinds: List[tuple] = []       # ('text', seg) | ('media', caption, ref)
    gold_ents: List[tuple] = []       # (char_start, char_end, surface, label)
    gold_triples: List[tuple] = []    # (subj, pred, obj, subj_type, obj_type)

    cur = 0  # char cursor in the assembled text (text segments joined by ' ')

    def _emit_media():
        cap = vocab.MEDIA_CAPTIONS[int(rng.integers(0, len(vocab.MEDIA_CAPTIONS)))]
        ref = "media://%012x" % int(rng.integers(0, 2**48))
        seg_kinds.append(("media", cap, ref))

    for si in range(n_segments):
        if si in media_positions:
            _emit_media()
        sentences: List[str] = []
        seg_start = cur
        n_sent = int(rng.integers(1, 3))
        for _ in range(n_sent):
            kind = rng.random()
            if kind < 0.55:  # relation sentence
                rel = _RELS[int(rng.integers(0, len(_RELS)))]
                st, ot, phrases = vocab.RELATION_PATTERNS[rel]
                subj, obj = _pick(rng, st), _pick(rng, ot)
                conn = phrases[0]
                sent = f"{subj} {conn} {obj} ."
                base = seg_start + sum(len(s) + 1 for s in sentences)
                gold_ents.append((base, base + len(subj), subj, st))
                o0 = base + len(subj) + 1 + len(conn) + 1
                gold_ents.append((o0, o0 + len(obj), obj, ot))
                gold_triples.append((subj, rel, obj, st, ot))
            elif kind < 0.8:  # entity sentence
                et = _TYPES[int(rng.integers(0, len(_TYPES)))]
                ent = _pick(rng, et)
                fill = " ".join(
                    vocab.FILLER[int(k)]
                    for k in rng.integers(0, len(vocab.FILLER), size=int(rng.integers(2, 6)))
                )
                sent = f"{ent} {fill} ."
                base = seg_start + sum(len(s) + 1 for s in sentences)
                gold_ents.append((base, base + len(ent), ent, et))
            else:  # filler sentence
                fill = " ".join(
                    vocab.FILLER[int(k)]
                    for k in rng.integers(0, len(vocab.FILLER), size=int(rng.integers(4, 9)))
                )
                sent = f"{fill} ."
            sentences.append(sent)
        seg = " ".join(sentences)
        segments.append(seg)
        seg_kinds.append(("text", seg))
        cur = seg_start + len(seg) + 1  # +1 for the joining space
    if n_segments in media_positions:
        _emit_media()

    # assemble spans array with char offsets into the assembled text
    spans = []
    cur = 0
    for sk in seg_kinds:
        if sk[0] == "text":
            spans.append({"kind": "text", "text": sk[1], "media_ref": None, "offset": cur})
            cur += len(sk[1]) + 1
        else:
            spans.append({"kind": "media", "text": sk[1], "media_ref": sk[2], "offset": cur})

    # depicts triples: first planted entity (doc order) anchors each media ref
    gold_ents.sort(key=lambda g: g[0])
    if gold_ents:
        anchor, anchor_t = gold_ents[0][2], gold_ents[0][3]
        for sp in spans:
            if sp["kind"] == "media":
                gold_triples.append((anchor, "depicts", sp["media_ref"], anchor_t, "media"))

    return {
        "doc_id": "doc-%010d" % i,
        "spans": spans,
        "gold_mentions": [
            {"start": s, "end": e, "text": t, "label": l} for s, e, t, l in gold_ents
        ],
        "gold_triples": [
            {"subj": s, "pred": p, "obj": o, "subj_type": st, "obj_type": ot}
            for s, p, o, st, ot in gold_triples
        ],
    }


def assembled_text(spans: List[dict]) -> str:
    """NER text = kind='text' span texts joined by ' ' (SURVEY §1.3)."""
    return " ".join(sp["text"] for sp in spans if sp["kind"] == "text")


# ---------------------------------------------------------------- Spark ----

SPANS_DDL = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
DOCS_DDL = f"doc_id string, spans {SPANS_DDL}"
FULL_DDL = (
    DOCS_DDL
    + ", gold_mentions array<struct<start:int,end:int,text:string,label:string>>"
    + ", gold_triples array<struct<subj:string,pred:string,obj:string,"
    + "subj_type:string,obj_type:string>>"
)


def _gen_batches(seed: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [gen_doc(int(i), seed) for i in b["id"]]
            yield pd.DataFrame(rows)
    return fn


def synth_docs(spark, n_docs: int, seed: int = 42, with_gold: bool = False,
               partitions: int = 0):
    """Distributed deterministic corpus: spark.range -> mapInPandas."""
    rng_df = spark.range(n_docs)
    if partitions:
        rng_df = rng_df.repartition(partitions)
    out = rng_df.mapInPandas(_gen_batches(seed), schema=FULL_DDL)
    return out if with_gold else out.select("doc_id", "spans")
