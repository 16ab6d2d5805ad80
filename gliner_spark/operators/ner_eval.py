"""CrossNER-style evaluation harness (the reference's correctness oracle).

Mirrors:
- char->word annotation conversion: evaluate_ner.py:48-99 (process) —
  char-offset entities to word-level END-INCLUSIVE indices;
- model.evaluate(): model.py:2410-2453 — predict over gold-tokenized docs,
  micro P/R/F1 on exact (label, (start, end)) word spans
  (evaluator.py:132-194).

Everything distributed: predictions via mapInPandas, F1 via join+count.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gliner_spark.core.model import GlinerSparkModel
from gliner_spark.core.tokenization import tokenize_with_offsets
from gliner_spark.operators.evaluation import micro_prf

NER_EVAL_DDL = (
    "doc_id string, tokenized_text array<string>, "
    "ner array<struct<start:int,end:int,label:string>>"
)
PRED_DDL = (
    "doc_id string, start int, end int, label string, score double"
)


def char_to_word_ner(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text, char_ner array<struct<start,end,label>>) ->
    NER_EVAL_DDL rows. Port of the conversion arithmetic in
    evaluate_ner.py:48-99: word i covers [starts[i], ends[i]); an entity's
    word span is the tokens fully inside [cs, ce); end INCLUSIVE."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, text, char_ner in zip(b["doc_id"], b["text"], b["char_ner"]):
                toks, starts, ends = tokenize_with_offsets(text)
                ner = []
                for ent in char_ner:
                    cs, ce = ent["start"], ent["end"]
                    widx = [
                        i
                        for i in range(len(toks))
                        if starts[i] >= cs and ends[i] <= ce
                    ]
                    if widx:
                        ner.append(
                            {"start": widx[0], "end": widx[-1], "label": ent["label"]}
                        )
                rows.append(
                    {"doc_id": doc_id, "tokenized_text": toks, "ner": ner}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "tokenized_text", "ner"])

    return docs.mapInPandas(fn, schema=NER_EVAL_DDL)


def predict_word_spans(eval_df: DataFrame, model: GlinerSparkModel) -> DataFrame:
    """Word-level span predictions over gold-tokenized docs (the evaluate()
    prediction pass, model.py:1975-2016)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, toks in zip(b["doc_id"], b["tokenized_text"]):
                text = " ".join(toks)
                mentions, _, _, _ = model.predict_doc(text)
                for m in mentions:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "start": m["word_start"],
                            "end": m["word_end"],
                            "label": m["label"],
                            "score": m["score"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "start", "end", "label", "score"]
            )

    return eval_df.select("doc_id", "tokenized_text").mapInPandas(
        fn, schema=PRED_DDL
    )


def evaluate_ner(eval_df: DataFrame, model: GlinerSparkModel) -> DataFrame:
    """model.evaluate() analog: one-row micro P/R/F1 DataFrame."""
    pred = predict_word_spans(eval_df, model)
    gold = eval_df.select("doc_id", F.explode("ner").alias("g")).select(
        "doc_id", "g.start", "g.end", "g.label"
    )
    return micro_prf(pred, gold, ["doc_id", "label", "start", "end"])
