"""Shared text primitives for the data-pipeline operators.

Design rule: every derived value must be reproducible by the ANSI-SQL
oracle (DuckDB) — so hashing is arithmetic over dense token ids (identical
in any engine), never an engine-specific hash function.

Scale note: the dense-rank vocab uses a global window over DISTINCT tokens.
At 100 TB the distinct-token table is still tiny relative to the corpus
(natural-language vocabulary saturates in the millions), and the window
runs on that deduplicated table only; if a corpus ever breaks that
assumption, swap token_id for xxhash64(token) and drop oracle parity for
the affected queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

P31 = 2147483647  # arithmetic-hash modulus (2^31 - 1), shared with oracles

# fixed affine constants per minhash permutation j: a_j = 2j+3, b_j = j+1
# (small odd multipliers; exactly reproducible in SQL)
MINHASH_ROWS = 8
MINHASH_BANDS = 4

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is"]

# language marker sets for the n-gram/keyword heuristic (closed vocab)
LANG_MARKERS = {
    "en": ["the", "a", "value", "fast"],
    "es": ["table", "sort"],
    "fr": ["column", "merge"],
    "de": ["window", "batch"],
    "zh": ["spark", "stream"],
}
LANG_ORDER = ["en", "es", "fr", "de", "zh"]  # deterministic tie-break


def tokens_table(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, tok) — whitespace split with positions (0-based)."""
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


def vocab_table(toks: DataFrame) -> DataFrame:
    """(tok, token_id) dense 1-based ids by lexicographic order.

    Window over the deduplicated token set only (see module doc).
    """
    return (
        toks.select("tok")
        .distinct()
        .withColumn("token_id", F.row_number().over(Window.orderBy("tok")))
    )


def token_ids(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, token_id)."""
    toks = tokens_table(docs)
    return toks.join(vocab_table(toks), "tok").select("doc_id", "pos", "token_id")


def affine_hash(col, j: int):
    """h_j(x) = ((2j+3) * x + (j+1)) mod P31 — oracle-reproducible."""
    return (col * F.lit(2 * j + 3) + F.lit(j + 1)) % F.lit(P31)
