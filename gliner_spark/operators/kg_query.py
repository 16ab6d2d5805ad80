"""Conjunctive query (basic graph pattern) matching over the
constructed KG — the SPARQL BGP / Datalog conjunctive-query core that
makes a triples table *queryable* rather than merely materialized.

- conjunctive_match: bind a connected pattern of (subj, pred, obj)
  atoms with ?variables against the canonical triples table and return
  one row per distinct variable binding.

Reference scope note: urchade/GLiNER emits the triples
(model.py predict_entities / predict_relations); answering structured
queries over the emitted graph is the beyond-reference pipeline
mandate (SURVEY.md §2.11).

Spark-first shape: every atom compiles to a predicate-filtered
projection of the triples scan (the pred filter is pushed to the
parquet/source scan; only subj/obj columns survive pruning), and the
pattern compiles to a chain of equi-joins on shared variables — the
exact plan a SPARQL engine's worst-case-optimal alternatives degrade
to for acyclic patterns, and the one Catalyst can optimize: selective
atoms become broadcast sides under AQE, join order within the chain
reorders freely because each step is a plain inner equi-join.
Disconnected patterns are rejected (they would be cartesian products).

Determinism contract: output is the DISTINCT set of bindings, columns
named by variable sorted lexicographically — replayable as a plain
self-join in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gliner_spark.cache import forward_caches


def _is_var(term: str) -> bool:
    return term.startswith("?")


def conjunctive_match(
    triples: DataFrame,
    atoms: list,
    neq: tuple = (),
) -> DataFrame:
    """Match a conjunctive pattern against (subj, pred, obj) triples.

    atoms: [(subj_term, pred, obj_term), ...] where a term starting
    with "?" is a variable and anything else is an entity constant;
    pred is always a constant (bounded predicate vocabulary — regular
    path queries over predicates live in metapath_counts).
    neq: pairs of variable names that must bind to distinct entities
    (the SPARQL `FILTER(?a != ?b)` idiom).

    Returns one row per distinct binding; columns are the variable
    names (without "?") sorted lexicographically.

    Shape at scale: atom k contributes |edges(pred_k)| rows pruned to
    two columns; the running binding set only ever grows by the join
    selectivity of shared variables, never by cartesian blowup —
    connectivity is enforced. Self-joins of the same predicate are
    fine (distinct alias per atom)."""
    bound, bound_vars = _bind_pattern(triples, atoms)
    for a, b in neq:
        bound = bound.filter(F.col(a) != F.col(b))
    out_cols = sorted(v for v in bound_vars)
    if not out_cols:
        # fully-ground pattern: a pure existence check — 1 row
        # (matched=true) when every atom holds, 0 rows otherwise
        out = bound.select(F.lit(True).alias("matched")).limit(1)
    else:
        # r7 (guide §2.4, "a distinct on data that is already unique"):
        # every atom frame is DISTINCT and the chain only ever
        # equi-joins on shared variables, so each variable-binding
        # combination appears exactly once in `bound`; the projection
        # keeps EVERY bound variable (out_cols == bound_vars, ground
        # markers are constant <=1-row gates), so a final distinct was a
        # full extra shuffle+aggregate of the result set that removed
        # nothing. The output row SET is unchanged.
        out = bound.select(*out_cols).orderBy(*out_cols)
    return forward_caches(out, triples)


def _bind_pattern(triples: DataFrame, atoms: list):
    """Compile a connected BGP to (bindings DF, bound variable set) —
    shared by conjunctive_match and optional_match."""
    if not atoms:
        raise ValueError("empty pattern")

    def atom_df(i: int, s: str, p: str, o: str) -> DataFrame:
        if _is_var(p):
            raise ValueError(f"atom {i}: predicate must be constant, got {p!r}")
        if _is_var(s) and _is_var(o) and s == o:
            raise ValueError(f"atom {i}: self-loop variable {s!r} twice")
        e = triples.filter(F.col("pred") == p)
        cols = []
        if _is_var(s):
            cols.append(F.col("subj").alias(s[1:]))
        else:
            e = e.filter(F.col("subj") == s)
        if _is_var(o):
            cols.append(F.col("obj").alias(o[1:]))
        else:
            e = e.filter(F.col("obj") == o)
        if not cols:
            # fully ground atom: contributes only an existence check
            cols = [F.lit(1).alias(f"_ground_{i}")]
        return e.select(*cols).distinct()

    bound = None
    bound_vars: set = set()
    for i, (s, p, o) in enumerate(atoms):
        df = atom_df(i, s, p, o)
        avars = {t[1:] for t in (s, o) if _is_var(t)}
        if bound is None:
            bound, bound_vars = df, avars
            continue
        shared = sorted(bound_vars & avars)
        if shared:
            bound = bound.join(df, shared)
        elif not avars:
            # fully ground atom: ≤1-row existence gate, broadcast side
            bound = bound.crossJoin(F.broadcast(df))
        elif not bound_vars:
            # everything so far was ground (≤1 row) — gate the new atom
            bound = df.crossJoin(F.broadcast(bound))
        else:
            raise ValueError(
                f"atom {i} {(s, p, o)!r} shares no variable with the "
                "pattern so far — disconnected patterns are cartesian "
                "products and are rejected; reorder the atoms"
            )
        bound_vars |= avars
    return bound, bound_vars


def optional_match(
    triples: DataFrame,
    atoms: list,
    optional: list,
    neq: tuple = (),
) -> DataFrame:
    """SPARQL OPTIONAL: required BGP left-outer-joined with each
    optional group's bindings (SPARQL 1.1 §8 OPTIONAL == the algebra's
    LeftJoin); variables bound only inside an unmatched optional group
    come back NULL — "return the org and, IF KNOWN, who acquired it".

    atoms: the required pattern (conjunctive_match semantics).
    optional: list of OPTIONAL groups, each a list of atoms forming a
    connected pattern that shares >= 1 variable with the REQUIRED part
    (a disconnected OPTIONAL would be a cartesian decoration and is
    rejected, same policy as the required chain).

    Supported fragment = WELL-DESIGNED patterns (Perez, Arenas &
    Gutierrez, TODS 2009 — the fragment where LeftJoin evaluation is
    spec-correct): each group's join variables must come from the
    required pattern (never from another OPTIONAL group — a NULL join
    key would silently differ from SPARQL's compatible-mapping
    semantics, so chained OPTIONALs are REJECTED, not mis-evaluated),
    and two groups may not both introduce the same new variable.

    Shape at scale: each group compiles to the same predicate-pushed
    distinct-binding subplan as the required pattern, then ONE left
    equi-join on the shared variables — no new shuffle class beyond
    conjunctive_match; the null-extension is free in the join.

    Determinism contract: distinct bindings, variable columns sorted
    lexicographically, NULLs last within the final orderBy."""
    bound, bound_vars = _bind_pattern(triples, atoms)
    req_vars = set(bound_vars)
    introduced: set = set()
    for group in optional:
        g, gvars = _bind_pattern(triples, group)
        shared = sorted(req_vars & gvars)
        if not shared:
            raise ValueError(
                f"OPTIONAL group {group!r} shares no variable with the "
                "required pattern — rejected (cartesian decoration, or a "
                "chained OPTIONAL outside the well-designed fragment)"
            )
        new_vars = gvars - req_vars
        clash = sorted(new_vars & introduced)
        if clash:
            raise ValueError(
                f"OPTIONAL group {group!r} re-introduces variable(s) "
                f"{clash} already bound by a previous OPTIONAL group — "
                "outside the well-designed fragment"
            )
        introduced |= new_vars
        # the group's bindings are already DISTINCT (atom frames are
        # distinct, equi-joins on shared variables preserve uniqueness),
        # so the left-join multiplicity is exactly one row per
        # (required binding x optional binding) with no extra shuffle
        bound = bound.join(g, shared, "left")
        bound_vars |= gvars
    for a, b in neq:
        bound = bound.filter(F.col(a) != F.col(b))
    out_cols = sorted(v for v in bound_vars)
    # r7: the final distinct was a no-op for the same reason (see
    # conjunctive_match) — required x optional combinations are unique,
    # NULL-extensions included; dropping it removes a full shuffle +
    # aggregate of the (fan-out sized) result set
    out = bound.select(*out_cols).orderBy(
        *[F.col(c).asc_nulls_last() for c in out_cols]
    )
    return forward_caches(out, triples)
