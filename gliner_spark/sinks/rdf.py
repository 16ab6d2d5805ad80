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

IRI policy: entity/predicate ids mint under the `base` URN namespace;
media objects are already URIs (media://...) and pass through intact.
Our id charset is [a-z0-9: _-] (label:md5hex, or a raw lowercase
surface when a rewrite fallback fired), so full percent-encoding
reduces to the space character — encoded as %20, with `<>"{}|^\\``
asserted absent rather than silently mangled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gliner_spark.cache import forward_caches

NT_BASE = "urn:gs:"
_FORBIDDEN = "[<>\"{}|^`\\\\]"


def _iri(col, kind: str):
    """Mint <base><kind>/<id> with %20 space-encoding; media refs (already
    URIs) pass through. Rows carrying forbidden IRI chars are the
    caller's bug — they are filtered to an audit, never mangled."""
    enc = F.regexp_replace(col, " ", "%20")
    return F.when(
        col.startswith("media://"), F.concat(F.lit("<"), col, F.lit(">"))
    ).otherwise(
        F.concat(F.lit("<" + NT_BASE + kind + "/"), enc, F.lit(">"))
    )


def to_ntriples(triples: DataFrame) -> DataFrame:
    """One N-Triples line per distinct (subj, pred, obj) fact.

    Output: (line string), lexicographically ordered — deterministic,
    diff-able, and the exact bytes `write.text` would stream. Rows whose
    terms contain characters the N-Triples IRI production forbids are
    dropped with a count carried on the audit channel (none occur in
    this pipeline; the guard is for foreign tables)."""
    from gliner_spark.metrics import attach_audits

    base = triples.select("subj", "pred", "obj").distinct()
    bad = (
        F.col("subj").rlike(_FORBIDDEN)
        | F.col("pred").rlike(_FORBIDDEN)
        | F.col("obj").rlike(_FORBIDDEN)
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
