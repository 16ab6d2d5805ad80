"""Shared text primitives for the data-pipeline operators.

Design rule: every derived value must be reproducible by the ANSI-SQL
oracle (DuckDB) — so hashing is arithmetic over codepoints / token ids
(identical in any engine), never an engine-specific hash function.

Scale note: token ids are the codepoint-fold hash of the token (default
mode) — a pure narrow JVM expression with NO distinct, NO global window and
NO vocab join, so the tokenize→id subtree never shuffles and scales to any
corpus. Hash collisions are deterministic and engine-identical, so oracle
parity holds exactly. The legacy dense-rank mode (global window over the
distinct vocabulary) remains available for dense 1..V ids but is a
single-task sort at web scale — do not use it in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

P31 = 2147483647  # arithmetic-hash modulus (2^31 - 1), shared with oracles
FOLD_M = 1000003  # fold multiplier (same as operators/linking.py shingles)

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


def fold_hash(col) -> Column:
    """Codepoint-fold hash h = foldl((acc, cp) -> (acc*1000003 + cp) % P31, 0).

    Pure narrow expression (sequence→ascii→aggregate, all JVM built-ins,
    whole-stage codegen); the DuckDB oracle reproduces it with list_reduce.
    Empty string hashes to 0 (ascii('') = 0 in both engines).
    ANSI-overflow-safe: acc < 2^31, acc*1000003 < 2^51.
    """
    c = F.col(col) if isinstance(col, str) else col
    cps = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        lambda i: F.ascii(c.substr(i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        cps,
        F.lit(0).cast("long"),
        lambda acc, cp: (acc * F.lit(FOLD_M) + cp) % F.lit(P31),
    )


def tokens_table(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, tok) — whitespace split with positions (0-based)."""
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


def token_id_array(text_col) -> Column:
    """array<long> of fold-hash token ids for a whitespace-split text column
    — the zero-shuffle building block for per-doc aggregates."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.transform(F.split(c, " "), fold_hash)


def vocab_table(toks: DataFrame) -> DataFrame:
    """(tok, token_id) dense 1-based ids by lexicographic order.

    LEGACY: global window over the deduplicated token set — a single-task
    sort that does not scale past vocabulary saturation; kept only for
    consumers that need dense 1..V ids (see module doc).
    """
    return (
        toks.select("tok")
        .distinct()
        .withColumn("token_id", F.row_number().over(Window.orderBy("tok")))
    )


def token_ids(docs: DataFrame, mode: str = "hash") -> DataFrame:
    """(doc_id, pos, token_id).

    mode='hash' (default): token_id = fold_hash(tok). The plan is
    scan→posexplode→project — fully narrow, no shuffle anywhere.
    mode='dense': legacy dense-rank ids (distinct + global window + join).
    """
    toks = tokens_table(docs)
    if mode == "hash":
        return toks.select(
            "doc_id", "pos", fold_hash(F.col("tok")).alias("token_id")
        )
    return toks.join(vocab_table(toks), "tok").select("doc_id", "pos", "token_id")


def affine_hash(col, j: int):
    """h_j(x) = ((2j+3) * x + (j+1)) mod P31 — oracle-reproducible."""
    return (col * F.lit(2 * j + 3) + F.lit(j + 1)) % F.lit(P31)
