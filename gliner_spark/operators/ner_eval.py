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


def predict_word_spans(
    eval_df: DataFrame, model: GlinerSparkModel, labels=None
) -> DataFrame:
    """Word-level span predictions over gold-tokenized docs (the evaluate()
    prediction pass, model.py:1975-2016). labels restricts to a zero-shot
    subset (evaluate()'s entity_types arg).

    The model ships via an explicit ``sc.broadcast`` (same discipline as
    operators/extraction.extract_graph): a closure capture re-serializes the
    model into every task of every stage, which matters once the weights are
    a real 100 MB+ encoder checkpoint."""
    bc = eval_df.sparkSession.sparkContext.broadcast(model)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc.value
        for b in batches:
            rows = []
            for doc_id, toks in zip(b["doc_id"], b["tokenized_text"]):
                text = " ".join(toks)
                mentions, _, _, _ = model.predict_doc(text, labels=labels)
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


def evaluate_ner(
    eval_df: DataFrame, model: GlinerSparkModel, labels=None
) -> DataFrame:
    """model.evaluate() analog: one-row micro P/R/F1 DataFrame."""
    pred = predict_word_spans(eval_df, model, labels=labels)
    gold = eval_df.select("doc_id", F.explode("ner").alias("g")).select(
        "doc_id", "g.start", "g.end", "g.label"
    )
    return micro_prf(pred, gold, ["doc_id", "label", "start", "end"])


# --------------------------------------------------- multi-dataset suite ----
# (name, seed, group, zero-shot label subset or None) — the analog of the
# reference's 18-dataset eval sweep (evaluate_ner.py:177-272): per-dataset
# scores split into a supervised benchmark group and a zero-shot group with
# per-group averages. Datasets here are seeded variants of the synthetic
# corpus; zero-shot datasets are evaluated with a restricted label set
# (prediction subset vs full gold), so their recall/F1 are non-trivial.
EVAL_SUITE = [
    ("synth_news", 42, "benchmark", None),
    ("synth_fin", 101, "benchmark", None),
    ("synth_web", 202, "benchmark", None),
    ("crossner_style_ai", 303, "zero_shot", ["person", "location"]),
    ("crossner_style_science", 404, "zero_shot", ["organization", "date"]),
]


def evaluate_ner_suite(
    spark, model: GlinerSparkModel, n_per_dataset: int, suite=EVAL_SUITE
) -> DataFrame:
    """Per-dataset micro P/R/F1 rows + one macro-average row per group
    (reference get_for_all_path, evaluate_ner.py:177-272: per-dataset F1,
    grouped into benchmark vs zero-shot, averaged per group).

    The per-dataset evaluations are independent lazy subplans unioned into
    ONE DataFrame — a single Spark job evaluates every dataset in parallel,
    instead of the reference's sequential per-dataset loop."""
    from functools import reduce

    from gliner_spark.sources.synth import synth_docs

    per = []
    for name, seed, grp, labels in suite:
        docs = synth_docs(
            spark, n_per_dataset, seed=seed, with_gold=True, partitions=8
        )
        with_text = docs.select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.filter("spans", lambda s: s.kind == "text"),
                    lambda s: s.text,
                ),
                " ",
            ).alias("text"),
            F.col("gold_mentions").alias("char_ner"),
        )
        res = evaluate_ner(char_to_word_ner(with_text), model, labels=labels)
        # round per-dataset metrics BEFORE averaging, so the group macro
        # average is a deterministic function of the displayed values
        per.append(
            res.select(
                F.lit(name).alias("dataset"),
                F.lit(grp).alias("grp"),
                "n_pred", "n_gold", "tp",
                F.round("precision", 6).alias("precision"),
                F.round("recall", 6).alias("recall"),
                F.round("f1", 6).alias("f1"),
            )
        )
    per_ds = reduce(lambda a, b: a.unionByName(b), per)
    avgs = (
        per_ds.groupBy("grp")
        .agg(
            F.sum("n_pred").alias("n_pred"),
            F.sum("n_gold").alias("n_gold"),
            F.sum("tp").alias("tp"),
            F.round(F.avg("precision"), 6).alias("precision"),
            F.round(F.avg("recall"), 6).alias("recall"),
            F.round(F.avg("f1"), 6).alias("f1"),
        )
        .select(
            F.concat(F.lit("zz_avg_"), F.col("grp")).alias("dataset"),
            "grp", "n_pred", "n_gold", "tp", "precision", "recall", "f1",
        )
    )
    return per_ds.unionByName(avgs)
