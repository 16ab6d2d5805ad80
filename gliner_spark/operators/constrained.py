"""Trie-constrained label generation over decoded mentions.

Reference parity: GenerationSpanModel's constrained decoding — the model
decodes spans, then GENERATES each span's label token-by-token with an
optional labels-trie restricting every step to valid label prefixes
(gliner/model.py:3173-3197 set_labels_trie + 3264-3267 generate_labels;
gliner/modeling/decoder.py:185-300 generate_from_embeds_custom;
gliner/decoding/trie/*). The trie semantics live in
core/labels_trie.LabelsTrie; this module is the Spark wiring.

Spark shape: the generation head is a pure function of the mention's
surface id — zero cross-row communication — so it runs as ONE mapInPandas
over the DISTINCT surface table (vocabulary-sized, orders of magnitude
smaller than the mention stream at 100 TB; the per-mention labels are a
broadcast join away if a consumer wants them back on the stream). The
trie + vocab ship in the task closure (a few hundred bytes here; a real
tokenizer's trie would ship via sc.broadcast exactly like the model
object in operators/extraction.py).

The deterministic stand-in scorer (core/labels_trie.gen_score) makes the
whole generation replayable by the DuckDB oracle (kg_constrained_labels
in __spark_entry__.py): greedy argmax per step, ties to the smallest
token id, EOS stops — both engines bit-agree.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gliner_spark.core.labels_trie import (
    EOS,
    LabelsTrie,
    constrained_greedy,
    fold_hash,
    free_greedy,
    tokenize_labels,
)

GEN_DDL = (
    "norm string, constrained_label string, free_label string, "
    "differs boolean"
)


def generate_mention_labels(
    mentions: DataFrame,
    labels: List[str],
    max_new_tokens: int = 4,
) -> DataFrame:
    """For every distinct mention surface, generate a label sequence twice
    — trie-CONSTRAINED (only valid label paths reachable) and FREE (argmax
    over the full label-word vocab each step) — and flag where they
    differ. The free path wandering off every valid label ("chemical
    person") is precisely what the reference added the trie to prevent.

    mentions: any frame with a `norm` column (the decode stage's output —
    this is the opt-in generation head over decoded spans, reference
    generate_labels(model_output)).
    """
    seqs, id2word = tokenize_labels(labels)
    vocab = sorted({t for s in seqs for t in s} | {EOS})

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        trie = LabelsTrie(seqs)  # tiny; rebuilt once per task
        for pdf in batches:
            o_norm, o_con, o_free, o_diff = [], [], [], []
            for norm in pdf["norm"]:
                nid = fold_hash(norm)
                con = constrained_greedy(
                    nid, trie, id2word, max_new_tokens
                )
                fre = free_greedy(nid, vocab, id2word, max_new_tokens)
                o_norm.append(norm)
                o_con.append(con)
                o_free.append(fre)
                o_diff.append(con != fre)
            yield pd.DataFrame(
                {
                    "norm": o_norm,
                    "constrained_label": o_con,
                    "free_label": o_free,
                    "differs": o_diff,
                }
            )

    surfaces = mentions.select("norm").distinct()
    return surfaces.mapInPandas(fn, schema=GEN_DDL)
