"""RDF interop sink: serialize the canonical triples table as
N-Triples lines (RDF 1.1 N-Triples grammar, W3C REC-n-triples-20140225)
— the lingua-franca export consumed by any triple store (Jena, RDFox,
Virtuoso, Blazegraph bulk loaders all ingest N-Triples line-per-fact).

Reference scope note: urchade/GLiNER stops at python dicts; graph
interchange formats are beyond-reference pipeline mandate (SURVEY §2.11).

Spark-first shape: serialization is a per-row projection (zero
shuffles beyond the distinct the caller's contract asks for) and the
output is line-oriented BY DESIGN — `df.write.text(...)` streams it
from every executor in parallel; one file per partition is exactly the
bulk-load sharding a store wants at 100 TB.

IRI policy: MINTED terms (entity/predicate ids under the urn:gs
namespace) are percent-encoded injectively — '%' -> %25 first, then
' ' -> %20, so 'a b' and 'a%20b' stay distinct IRIs. PASS-THROUGH
terms (media://... objects, already URIs) are validated, never
re-encoded: re-encoding an already-encoded URI corrupts it. Any term
carrying a character the IRIREF production forbids outright
(#x00-#x20 controls, <>"{}|^`\\ — space only forbidden in the
pass-through case, since minting encodes it) drops the row with a
count on the audit channel; NULL terms likewise drop AND count."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gliner_spark.cache import forward_caches

NT_BASE = "urn:gs:"
# IRIREF-forbidden outright: controls + the bracket/quote/caret set.
# \x20 (space) is excluded here because minted ids encode it; media
# pass-through terms get the stricter _URI_FORBIDDEN below.
_FORBIDDEN = "[<>\"{}|^`\\\\\\x00-\\x1f]"
_URI_FORBIDDEN = "[<>\"{}|^`\\\\\\x00-\\x20]"


def _is_media(col):
    return col.startswith("media://")


def _term_bad(col):
    """NULL-safe per-term drop predicate (NULL counts as bad)."""
    return F.coalesce(
        F.when(_is_media(col), col.rlike(_URI_FORBIDDEN)).otherwise(
            col.rlike(_FORBIDDEN)
        ),
        F.lit(True),
    )


def _iri(col, kind: str):
    """Mint <base><kind>/<id> (injective %25-then-%20 encoding); media
    refs (already URIs) pass through verbatim — they were validated,
    not encoded."""
    enc = F.regexp_replace(
        F.regexp_replace(col, "%", "%25"), " ", "%20"
    )
    return F.when(
        _is_media(col), F.concat(F.lit("<"), col, F.lit(">"))
    ).otherwise(
        F.concat(F.lit("<" + NT_BASE + kind + "/"), enc, F.lit(">"))
    )


def to_ntriples(triples: DataFrame) -> DataFrame:
    """One N-Triples line per distinct (subj, pred, obj) fact.

    Output: (line string), lexicographically ordered — deterministic,
    diff-able, and the exact bytes `write.text` would stream. Rows with
    a NULL term or a term the IRI productions forbid (see module
    docstring) are dropped with a count carried on the audit channel
    (none occur in this pipeline; the guard is for foreign tables)."""
    from gliner_spark.metrics import attach_audits

    base = triples.select("subj", "pred", "obj").distinct()
    bad = (
        _term_bad(F.col("subj"))
        | _term_bad(F.col("pred"))
        | _term_bad(F.col("obj"))
    )
    audit = base.agg(
        F.lit("ntriples_forbidden_iri").alias("guard"),
        F.coalesce(F.sum(bad.cast("int")), F.lit(0))
        .cast("long")
        .alias("n_dropped_rows"),
        F.lit(0).cast("long").alias("max_group_size"),
        F.lit(0).cast("long").alias("cap"),
    )
    clean = base.filter(~bad)
    out = (
        clean.select(
            F.concat_ws(
                " ",
                _iri(F.col("subj"), "entity"),
                _iri(F.col("pred"), "pred"),
                _iri(F.col("obj"), "entity"),
                F.lit("."),
            ).alias("line")
        )
        .orderBy("line")
    )
    return attach_audits(forward_caches(out, triples), audit)
