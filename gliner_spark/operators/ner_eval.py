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
    eval_df: DataFrame, model: GlinerSparkModel, labels=None, _bc=None
) -> DataFrame:
    """Word-level span predictions over gold-tokenized docs (the evaluate()
    prediction pass, model.py:1975-2016). labels restricts to a zero-shot
    subset (evaluate()'s entity_types arg).

    The model ships via an explicit ``sc.broadcast`` (same discipline as
    operators/extraction.extract_graph): a closure capture re-serializes the
    model into every task of every stage, which matters once the weights are
    a real 100 MB+ encoder checkpoint. Callers issuing several prediction
    passes reuse one broadcast via _bc."""
    bc = _bc or eval_df.sparkSession.sparkContext.broadcast(model)

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


SUITE_DOCS_DDL = (
    "doc_id string, text string, "
    "char_ner array<struct<start:int,end:int,text:string,label:string>>"
)


def synth_suite_docs(
    spark, n_per_dataset: int, suite=EVAL_SUITE, partitions: int = 16
) -> DataFrame:
    """ONE generation job for the whole suite: spark.range(n * |suite|) ->
    mapInPandas; row id maps to (dataset = id // n, doc index = id % n)
    with the dataset's seed folded into the generator, so all five corpora
    materialize in one scan instead of five independent subplans. doc_id is
    dataset-prefixed ('<dataset>:doc-...') — downstream stages recover the
    dataset with split_part and need no extra passthrough column through
    the prediction UDF."""
    from gliner_spark.sources.synth import assembled_text, gen_doc

    names = [s[0] for s in suite]
    seeds = [s[1] for s in suite]
    n = n_per_dataset

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for rid in b["id"]:
                k, i = divmod(int(rid), n)
                d = gen_doc(i, seed=seeds[k])
                rows.append(
                    {
                        "doc_id": f"{names[k]}:{d['doc_id']}",
                        "text": assembled_text(d["spans"]),
                        "char_ner": d["gold_mentions"],
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "text", "char_ner"])

    rng = spark.range(n * len(suite))
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(fn, schema=SUITE_DOCS_DDL)


def evaluate_ner_suite(
    spark, model: GlinerSparkModel, n_per_dataset: int, suite=EVAL_SUITE
) -> DataFrame:
    """Per-dataset micro P/R/F1 rows + one macro-average row per group
    (reference get_for_all_path, evaluate_ner.py:177-272: per-dataset F1,
    grouped into benchmark vs zero-shot, averaged per group).

    ONE shared pipeline: a single synth job generates all datasets (seed
    folded into the generator), one prediction pass PER DISTINCT LABEL SET
    over its disjoint slice of the corpus (restrict-before-predict — the
    reference evaluate() semantics, preserved exactly: under flat greedy
    decode an excluded-label span must not be able to suppress an
    included-label one), and a grouped full-outer join computes all
    per-dataset counts — instead of five independent synth+predict
    subplans. Total prediction work is unchanged (the slices partition the
    corpus); the synth/char->word subtree is shared and runs once."""
    from functools import reduce

    docs = synth_suite_docs(spark, n_per_dataset, suite)
    # branch point: the prediction UDFs and the gold explode all consume
    # this frame — persist so synth + char->word conversion run once
    eval_df = char_to_word_ner(docs).persist()

    ds = F.split_part(F.col("doc_id"), F.lit(":"), F.lit(1))
    # one pass per distinct label subset, over that subset's datasets only
    by_labels = {}
    for name, _, _, labels in suite:
        key = tuple(labels) if labels is not None else None
        by_labels.setdefault(key, []).append(name)
    bc = spark.sparkContext.broadcast(model)  # one broadcast for all passes
    preds = []
    for key, names in by_labels.items():
        part = eval_df.filter(ds.isin(names))
        # `key is not None`, NOT truthiness: an empty label list is a valid
        # degenerate zero-shot spec (predict nothing), not "no restriction"
        preds.append(
            predict_word_spans(
                part, model,
                labels=list(key) if key is not None else None, _bc=bc,
            )
        )
    pred = reduce(lambda a, b: a.unionByName(b), preds)

    gold = eval_df.select("doc_id", F.explode("ner").alias("g")).select(
        "doc_id", "g.start", "g.end", "g.label"
    )
    keys = ["doc_id", "label", "start", "end"]
    p = pred.select(*keys).distinct().withColumn("in_p", F.lit(1))
    g = gold.select(*keys).distinct().withColumn("in_g", F.lit(1))
    counts = (
        p.join(g, keys, "full_outer")
        .groupBy(ds.alias("dataset"))
        .agg(
            F.coalesce(F.sum("in_p"), F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce(F.sum("in_g"), F.lit(0)).cast("long").alias("n_gold"),
            F.coalesce(F.sum(F.col("in_p") * F.col("in_g")), F.lit(0))
            .cast("long")
            .alias("tp"),
        )
    )
    # materialize a row for every suite dataset even if it had zero spans,
    # and attach the group label (tiny broadcast join)
    meta = spark.createDataFrame(
        [(name, grp) for name, _, grp, _ in suite], "dataset string, grp string"
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")).otherwise(0.0)
    f1 = F.when(
        (prec + rec) > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(0.0)
    # round per-dataset metrics BEFORE averaging, so the group macro
    # average is a deterministic function of the displayed values
    per_ds = (
        F.broadcast(meta)
        .join(counts, "dataset", "left")
        .na.fill(0, ["n_pred", "n_gold", "tp"])
        .select(
            "dataset", "grp", "n_pred", "n_gold", "tp",
            F.round(prec, 6).alias("precision"),
            F.round(rec, 6).alias("recall"),
            F.round(f1, 6).alias("f1"),
        )
    )
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
    from gliner_spark.cache import attach_caches

    # eval_df persists past return by design (the caller's action hits the
    # cache); release with cache.release_caches() after consuming
    return attach_caches(per_ds.unionByName(avgs), eval_df)
