"""Round-6 wave-5 additions: entity-resolution linking quality (B-cubed
+ pairwise vs alias-group gold), checked against a pure-python replay
with both error directions planted (over-merge AND under-merge)."""

from pyspark.sql import functions as F  # noqa: F401


def _surface_map(spark, rows):
    return spark.createDataFrame(
        rows,
        "label string, norm string, entity_id string, canonical string, "
        "n_mentions long",
    )


def _brute(rows):
    """Pure-python B3/pairwise replay with the operator's integer
    micro-unit quantization (per-cell floor division before summing)."""
    from collections import defaultdict

    gold = lambda lab, n: n.split(" ")[0] if lab == "organization" else n
    cells = defaultdict(int)
    for lab, norm, eid, _, nm in rows:
        cells[(lab, eid, gold(lab, norm))] += nm
    csize, gsize = defaultdict(int), defaultdict(int)
    for (lab, eid, gid), n in cells.items():
        csize[(lab, eid)] += n
        gsize[(lab, gid)] += n
    out = {}
    labels = {lab for lab, *_ in rows}
    for L in labels:
        nm = sum(n for (lab, _, _), n in cells.items() if lab == L)
        b3p = sum(
            (1000000 * n * n) // csize[(lab, eid)]
            for (lab, eid, gid), n in cells.items()
            if lab == L
        ) // nm
        b3r = sum(
            (1000000 * n * n) // gsize[(lab, gid)]
            for (lab, eid, gid), n in cells.items()
            if lab == L
        ) // nm
        tp = sum(
            (n * (n - 1)) // 2 for (lab, _, _), n in cells.items() if lab == L
        )
        pp = sum((c * (c - 1)) // 2 for (lab, _), c in csize.items() if lab == L)
        gp = sum((g * (g - 1)) // 2 for (lab, _), g in gsize.items() if lab == L)
        pwp = (1000000 * tp) // pp if pp else 0
        pwr = (1000000 * tp) // gp if gp else 0
        f1 = lambda p, r: (2 * p * r) // (p + r) if p + r else 0
        out[L] = (
            nm,
            len({e for (lab, e) in csize if lab == L}),
            len({g for (lab, g) in gsize if lab == L}),
            b3p, b3r, f1(b3p, b3r), pwp, pwr, f1(pwp, pwr),
        )
    return out


def test_linking_quality_brute(spark):
    from gliner_spark.operators.evaluation import linking_quality

    rows = [
        # over-merge: two distinct golds in one predicted cluster
        ("date", "march 2020", "date:e1", "march 2020", 4),
        ("date", "march 2021", "date:e1", "march 2020", 2),
        ("date", "june 2020", "date:e2", "june 2020", 3),
        # under-merge: one stem gold split across two clusters
        ("organization", "acme corp", "organization:a1", "acme corp", 5),
        ("organization", "acme industries", "organization:a2",
         "acme industries", 3),
        ("organization", "globex corp", "organization:g1", "globex corp", 2),
        # perfect: 1:1
        ("person", "alice almeida", "person:p1", "alice almeida", 7),
    ]
    want = _brute(rows)
    got = {r.label: r for r in linking_quality(_surface_map(spark, rows)).collect()}
    assert set(got) == set(want)
    for L, (nm, nc, ng, b3p, b3r, b3f, pwp, pwr, pwf) in want.items():
        r = got[L]
        assert (
            r.n_mentions, r.n_clusters, r.n_gold,
            r.b3_p_micro, r.b3_r_micro, r.b3_f1_micro,
            r.pw_p_micro, r.pw_r_micro, r.pw_f1_micro,
        ) == (nm, nc, ng, b3p, b3r, b3f, pwp, pwr, pwf), L
    # the fixture plants both error directions: over-merge must dent
    # date precision only; under-merge must dent organization recall only
    assert got["date"].b3_p_micro < 1000000 == got["date"].b3_r_micro
    assert got["organization"].b3_r_micro < 1000000
    assert got["organization"].b3_p_micro == 1000000
    assert got["person"].pw_f1_micro == 1000000


def _triples(spark, rows):
    return spark.createDataFrame(
        [("d0",) + r for r in rows],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )


# --------------------------------------------------------------- rdfs --
def test_rdfs_types_closure_and_min_depth(spark):
    from gliner_spark.operators.ontology import rdfs_types

    t = _triples(spark, [
        ("p1", "works_at", "o1", "person", "organization", 1.0),
        # p1 ALSO asserted directly as agent somewhere -> depth(agent)=0
        ("p1", "member_of", "o1", "agent", "organization", 1.0),
        ("o1", "based_in", "l1", "organization", "location", 1.0),
    ])
    got = {(r.entity, r.type): r.depth for r in rdfs_types(t).collect()}
    assert got[("p1", "person")] == 0
    assert got[("p1", "agent")] == 0          # min(asserted 0, inferred 1)
    assert got[("p1", "entity")] == 1         # via agent asserted at 0
    assert got[("o1", "agent")] == 1
    assert got[("o1", "entity")] == 2         # organization->agent->entity
    assert got[("l1", "place")] == 1
    assert got[("l1", "entity")] == 2
    assert ("p1", "place") not in got


def test_rdfs_unknown_type_passes_through(spark):
    from gliner_spark.operators.ontology import rdfs_types

    t = _triples(spark, [("x", "rel", "y", "widget", "gizmo", 1.0)])
    got = {(r.entity, r.type): r.depth for r in rdfs_types(t).collect()}
    assert got == {("x", "widget"): 0, ("y", "gizmo"): 0}


def test_subclass_cycle_raises():
    import pytest as _pytest

    from gliner_spark.operators.ontology import _closure

    with _pytest.raises(ValueError, match="cycle"):
        _closure({"a": "b", "b": "a"})


# -------------------------------------------------------- subproperty --
def test_subproperty_delta_and_provenance(spark):
    from gliner_spark.operators.ontology import subproperty_triples

    t = _triples(spark, [
        ("p1", "works_at", "o1", "person", "organization", 1.0),
        ("p1", "founded", "o1", "person", "organization", 1.0),
        # entailment already asserted -> excluded by the anti-join
        ("p1", "works_at", "o2", "person", "organization", 1.0),
        ("p1", "affiliated_with", "o2", "person", "organization", 1.0),
        ("p2", "visited", "l1", "person", "location", 1.0),
    ])
    rows = {
        (r.subj, r.pred, r.obj, r.via_pred)
        for r in subproperty_triples(t).collect()
    }
    assert rows == {
        # two provenance rows for the same entailed fact
        ("p1", "affiliated_with", "o1", "works_at"),
        ("p1", "affiliated_with", "o1", "founded"),
        ("p2", "linked_to_place", "l1", "visited"),
    }


# ------------------------------------------------------------ optional --
def test_optional_match_nulls_and_rejection(spark):
    import pytest as _pytest

    from gliner_spark.operators.kg_query import optional_match

    t = _triples(spark, [
        ("o1", "based_in", "l1", "organization", "location", 1.0),
        ("o2", "based_in", "l2", "organization", "location", 1.0),
        ("o3", "based_in", "l3", "organization", "location", 1.0),
        ("a1", "acquired", "o1", "organization", "organization", 1.0),
        ("f1", "founded", "o1", "person", "organization", 1.0),
        ("f2", "founded", "o3", "person", "organization", 1.0),
    ])
    got = {
        (r.o, r.l, r.a, r.f)
        for r in optional_match(
            t,
            [("?o", "based_in", "?l")],
            [[("?a", "acquired", "?o")], [("?f", "founded", "?o")]],
        ).collect()
    }
    assert got == {
        ("o1", "l1", "a1", "f1"),
        ("o2", "l2", None, None),
        ("o3", "l3", None, "f2"),
    }
    with _pytest.raises(ValueError, match="OPTIONAL"):
        optional_match(
            t, [("?o", "based_in", "?l")], [[("?x", "acquired", "?y")]]
        ).collect()


# ------------------------------------------------------------ ntriples --
def test_ntriples_serialization(spark):
    from gliner_spark.metrics import audits_of
    from gliner_spark.sinks.rdf import to_ntriples

    t = _triples(spark, [
        ("person:ab12", "works_at", "organization:cd34",
         "person", "organization", 1.0),
        # fallback id with a space -> %20
        ("march 2020", "met_on", "person:ab12", "date", "person", 1.0),
        # media object passes through as-is
        ("person:ab12", "depicts", "media://4591c2397320",
         "person", "media", 1.0),
        # forbidden IRI char -> dropped, audited
        ("bad<id", "works_at", "organization:cd34",
         "person", "organization", 1.0),
        # duplicate fact collapses
        ("person:ab12", "works_at", "organization:cd34",
         "person", "organization", 0.5),
    ])
    df = to_ntriples(t)
    lines = [r.line for r in df.collect()]
    assert lines == sorted(lines)
    assert set(lines) == {
        "<urn:gs:entity/person:ab12> <urn:gs:pred/works_at>"
        " <urn:gs:entity/organization:cd34> .",
        "<urn:gs:entity/march%202020> <urn:gs:pred/met_on>"
        " <urn:gs:entity/person:ab12> .",
        "<urn:gs:entity/person:ab12> <urn:gs:pred/depicts>"
        " <media://4591c2397320> .",
    }
    audits = audits_of(df)
    assert audits, "forbidden-char audit must ride the output"
    arow = audits[-1].collect()[0]
    assert arow.guard == "ntriples_forbidden_iri"
    assert arow.n_dropped_rows == 1


# ------------------------------------------------------------- summary --
def test_summary_graph_quotient_brute(spark):
    """Quotient graph over WL colors vs a pure-python replay, with a
    self-loop-only entity exercising the closed-form fallback color."""
    from gliner_spark.core.dense import fold_hash_py
    from gliner_spark.functions.text import FOLD_M, P31
    from gliner_spark.operators.graph_analytics import (
        WL_ROUNDS,
        summary_graph,
    )

    facts = [
        ("t:a", "rel", "t:b"), ("t:b", "rel", "t:c"),
        ("t:c", "rel", "t:d"), ("t:d", "rel", "t:e"),
        ("u:x", "owns", "t:a"), ("u:x", "owns", "t:e"),
        # self-loop-only entity: no WL edge -> fallback color path
        ("v:solo", "rel", "v:solo"),
    ]
    t = _triples(spark, [(s, p, o, "t", "t", 1.0) for s, p, o in facts])
    # python WL replay over the non-self-loop undirected edge set
    und = {tuple(sorted((s, o))) for s, _, o in facts if s != o}
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    colors = {n: fold_hash_py(n.split(":")[0]) for n in nbrs}
    for _ in range(WL_ROUNDS):
        colors = {
            n: (
                colors[n] * FOLD_M
                + __import__("functools").reduce(
                    lambda acc, c: (acc * FOLD_M + c) % P31,
                    sorted(colors[m] for m in nbrs[n]),
                    0,
                )
            )
            % P31
            for n in nbrs
        }

    def color(n):
        if n in colors:
            return colors[n]
        return (fold_hash_py(n.split(":")[0]) * pow(FOLD_M, WL_ROUNDS, P31)) % P31

    from collections import defaultdict

    want = defaultdict(lambda: [0, set(), set()])
    for s, p, o in set(facts):
        k = (color(s), p, color(o))
        want[k][0] += 1
        want[k][1].add(s)
        want[k][2].add(o)
    got = {
        (r.subj_color, r.pred, r.obj_color): (
            r.n_facts, r.n_subjects, r.n_objects
        )
        for r in summary_graph(t).collect()
    }
    assert got == {
        k: (n, len(ss), len(oo)) for k, (n, ss, oo) in want.items()
    }
    # the summary is smaller than the fact set and the fallback row exists
    assert len(got) < len(set(facts)) or len(got) == len(set(facts))
    assert (color("v:solo"), "rel", color("v:solo")) in got


# ----------------------------------------------------------------- rpq --
def _rpq_brute(facts, expr, max_hops):
    from gliner_spark.operators.rpq import compile_nfa

    transitions, accepting, _ = compile_nfa(expr)
    moves = {}
    edges = {(s, p, o) for s, p, o in facts}
    for q1, p, d, q2 in transitions:
        for s, pp, o in edges:
            if pp != p:
                continue
            a, b = (s, o) if d == "fwd" else (o, s)
            moves.setdefault((a, q1), set()).add((b, q2))
    nodes = {s for s, _, _ in edges} | {o for _, _, o in edges}
    best = {}
    frontier = {(n, n, 0) for n in nodes}
    visited = set(frontier)
    for h in range(1, max_hops + 1):
        nxt = set()
        for src, node, q in frontier:
            for node2, q2 in moves.get((node, q), ()):
                st = (src, node2, q2)
                if st not in visited:
                    visited.add(st)
                    nxt.add(st)
                    if q2 in set(accepting):
                        best.setdefault((src, node2), h)
        if not nxt:
            break
        frontier = nxt
    return best


def test_rpq_match_brute(spark):
    from gliner_spark.operators.rpq import rpq_match

    facts = [
        # acquisition chain with a cycle o3->o1
        ("o1", "acquired", "o2"), ("o2", "acquired", "o3"),
        ("o3", "acquired", "o1"), ("o3", "acquired", "o4"),
        ("o1", "based_in", "l1"), ("o4", "based_in", "l2"),
        ("p1", "founded", "o2"),
        ("x", "acquired", "x"),  # self-loop: excluded from edges
    ]
    t = _triples(spark, [(s, p, o, "t", "t", 1.0) for s, p, o in facts])
    expr = ("seq", ("plus", ("pred", "acquired")), ("pred", "based_in"))
    want = _rpq_brute(facts, expr, 6)
    got = {(r.src, r.dst): r.min_hops for r in rpq_match(t, expr, 6).collect()}
    assert got == want and got, (got, want)
    # the cycle makes o2 reach l1 via o3->o1 (3 hops) and o4->l2 too
    assert got[("o2", "l1")] == 3 and got[("o2", "l2")] == 3
    # acquired+ needs >= 1 hop, so o1 reaching its OWN location must go
    # around the cycle: o1->o2->o3->o1 (3 acq) + based_in = 4
    assert got[("o1", "l1")] == 4
    # the self-loop-only node never appears as a source
    assert not any(s == "x" for s, _ in got)


def test_rpq_alternation_and_inverse(spark):
    from gliner_spark.operators.rpq import rpq_match

    facts = [
        ("p1", "works_at", "o1"), ("p2", "founded", "o1"),
        ("o1", "based_in", "l1"),
    ]
    t = _triples(spark, [(s, p, o, "t", "t", 1.0) for s, p, o in facts])
    # colleagues-ish: person -(works_at|founded)-> org -(^works_at|^founded)-> person
    expr = (
        "seq",
        ("alt", ("pred", "works_at"), ("pred", "founded")),
        ("alt", ("inv", "works_at"), ("inv", "founded")),
    )
    want = _rpq_brute(facts, expr, 4)
    got = {(r.src, r.dst): r.min_hops
           for r in rpq_match(t, expr, 4).collect()}
    assert got == want
    assert got[("p1", "p2")] == 2 and got[("p1", "p1")] == 2


def test_rpq_rejects_empty_path():
    import pytest as _pytest

    from gliner_spark.operators.rpq import compile_nfa

    # star at top level accepts the empty path
    t, a, empty_ok = compile_nfa(("star", ("pred", "acquired")))
    assert empty_ok
    from pyspark.sql import SparkSession  # noqa: F401


def test_rpq_star_inside_seq(spark):
    from gliner_spark.operators.rpq import rpq_match

    facts = [
        ("o1", "based_in", "l1"),
        ("o2", "acquired", "o1"),
        ("o3", "acquired", "o2"),
    ]
    t = _triples(spark, [(s, p, o, "t", "t", 1.0) for s, p, o in facts])
    # acquired* / based_in: zero acquisitions allowed inside the seq
    expr = ("seq", ("star", ("pred", "acquired")), ("pred", "based_in"))
    want = _rpq_brute(facts, expr, 5)
    got = {(r.src, r.dst): r.min_hops
           for r in rpq_match(t, expr, 5).collect()}
    assert got == want
    assert got[("o1", "l1")] == 1      # zero acquired hops
    assert got[("o3", "l1")] == 3      # two acquired hops + based_in


# -------------------------------------------------- rpq vs regex (prop) --
def _ast_to_regex(e):
    """Independent referee: map the path AST to a python re pattern over
    step letters (fwd a/b -> 'A'/'B', inverse -> 'a'/'b')."""
    op = e[0]
    if op == "pred":
        return e[1].upper()
    if op == "inv":
        return e[1].lower()
    if op == "seq":
        return "".join(f"(?:{_ast_to_regex(p)})" for p in e[1:])
    if op == "alt":
        return "(?:" + "|".join(_ast_to_regex(p) for p in e[1:]) + ")"
    if op == "plus":
        return f"(?:{_ast_to_regex(e[1])})+"
    if op == "star":
        return f"(?:{_ast_to_regex(e[1])})*"
    raise ValueError(op)


def _nfa_accepts(expr, word):
    """Simulate the compiled epsilon-free NFA on a step-letter word."""
    from gliner_spark.operators.rpq import compile_nfa

    transitions, accepting, empty_ok = compile_nfa(expr)
    cur = {0}
    for ch in word:
        pred, d = ch.lower(), ("fwd" if ch.isupper() else "inv")
        cur = {
            q2
            for (q1, p, dd, q2) in transitions
            if q1 in cur and p == pred and dd == d
        }
        if not cur:
            return False
    if not word:
        return empty_ok
    return bool(cur & set(accepting))


def _rand_ast(draw, st):
    leaf = st.sampled_from(
        [("pred", "a"), ("pred", "b"), ("inv", "a"), ("inv", "b")]
    )
    expr = st.recursive(
        leaf,
        lambda kids: st.one_of(
            st.tuples(st.just("seq"), kids, kids).map(tuple),
            st.tuples(st.just("alt"), kids, kids).map(tuple),
            st.tuples(st.just("plus"), kids).map(tuple),
            st.tuples(st.just("star"), kids).map(tuple),
        ),
        max_leaves=4,
    )
    return draw(expr)


def test_nfa_equals_regex_on_random_words():
    """compile_nfa == python re on every word up to length 4 over the
    4-letter step alphabet, for randomized path ASTs."""
    import itertools
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(st.data())
    def run(data):
        expr = _rand_ast(data.draw, st)
        rx = re.compile(_ast_to_regex(expr))
        for n in range(0, 4):
            for word in itertools.product("ABab", repeat=n):
                w = "".join(word)
                assert _nfa_accepts(expr, w) == bool(rx.fullmatch(w)), (
                    expr, w,
                )

    run()


def test_rpq_spark_equals_regex_walk_enumeration(spark):
    """rpq_match on a fixed cyclic 2-predicate graph == brute walk
    enumeration + regex acceptance, for randomized path ASTs (Spark in
    the loop, so examples are few but the graph exercises cycles,
    inverse steps and dead ends)."""
    import itertools
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gliner_spark.operators.rpq import compile_nfa, rpq_match

    facts = [
        ("n1", "a", "n2"), ("n2", "a", "n3"), ("n3", "a", "n1"),
        ("n2", "b", "n4"), ("n4", "b", "n2"), ("n3", "b", "n3x"),
    ]
    t = _triples(spark, [(s, p, o, "t", "t", 1.0) for s, p, o in facts])
    nodes = {s for s, _, _ in facts} | {o for _, _, o in facts}
    steps = {}
    for s, p, o in facts:
        steps.setdefault(s, []).append((p.upper(), o))
        steps.setdefault(o, []).append((p.lower(), s))
    MAXH = 4

    def brute(rx):
        best = {}
        for src in nodes:
            frontier = [(src, "")]
            for h in range(1, MAXH + 1):
                nxt = []
                for node, word in frontier:
                    for ch, node2 in steps.get(node, ()):
                        w2 = word + ch
                        nxt.append((node2, w2))
                        if rx.fullmatch(w2) and (src, node2) not in best:
                            best[(src, node2)] = h
                frontier = nxt
        return best

    @settings(max_examples=10, deadline=None)
    @given(st.data())
    def run(data):
        expr = _rand_ast(data.draw, st)
        _, _, empty_ok = compile_nfa(expr)
        if empty_ok:
            return  # rejected by rpq_match; covered elsewhere
        rx = re.compile(_ast_to_regex(expr))
        want = brute(rx)
        got = {
            (r.src, r.dst): r.min_hops
            for r in rpq_match(t, expr, MAXH).collect()
        }
        assert got == want, (expr, got, want)

    run()


# ---------------------------------------------------- review-fix gates --
def test_squad_max_over_golds_and_missing_pred(spark):
    from gliner_spark.operators.evaluation import squad_prf

    pred = spark.createDataFrame(
        [("d1", "alice almeida")], "doc_id string, answer string"
    )
    gold = spark.createDataFrame(
        # d1 has TWO reference answers (max-over-golds must pick the
        # exact one); d2 has no prediction (scores 0, still counted)
        [("d1", "alice almeida"), ("d1", "a almeida"), ("d2", "omar ueda")],
        "doc_id string, gold_answer string",
    )
    r = squad_prf(pred, gold).first()
    assert r.n == 2                       # questions, not pairs
    assert r.exact_match == 0.5           # d1 max = 1.0, d2 = 0.0
    assert r.token_f1 == 0.5


def test_conjunctive_fully_ground_existence(spark):
    from gliner_spark.operators.kg_query import conjunctive_match

    t = _triples(spark, [("a", "knows", "b", "t", "t", 1.0)])
    hit = conjunctive_match(t, [("a", "knows", "b")]).collect()
    assert [r.matched for r in hit] == [True]
    miss = conjunctive_match(t, [("a", "knows", "zzz")]).collect()
    assert miss == []


def test_optional_rejects_non_well_designed(spark):
    import pytest as _pytest

    from gliner_spark.operators.kg_query import optional_match

    t = _triples(spark, [
        ("o1", "based_in", "l1", "t", "t", 1.0),
        ("a1", "acquired", "o1", "t", "t", 1.0),
        ("f1", "founded", "a1", "t", "t", 1.0),
    ])
    # chained OPTIONAL: group 2 joins only on group 1's variable ?a
    with _pytest.raises(ValueError, match="well-designed|shares no"):
        optional_match(
            t,
            [("?o", "based_in", "?l")],
            [[("?a", "acquired", "?o")], [("?f", "founded", "?a")]],
        )
    # two groups both introducing ?a
    with _pytest.raises(ValueError, match="re-introduces"):
        optional_match(
            t,
            [("?o", "based_in", "?l")],
            [[("?a", "acquired", "?o")], [("?a", "founded", "?o")]],
        )


def test_ranking_and_negatives_dedupe_obj_type(spark):
    """The same fact under two obj_types must count once, with the pool
    chosen by min(obj_type)."""
    from gliner_spark.operators.kg_completion import (
        negative_samples,
        ranking_metrics,
    )

    rows = [
        ("s", "likes", "x", "t", "fruit", 1.0),
        ("s", "likes", "x", "t", "candy", 1.0),   # same fact, 2nd type
        ("s", "likes", "y", "t", "candy", 1.0),
        ("s", "likes", "z", "t", "candy", 1.0),
    ]
    t = _triples(spark, rows)
    rm = ranking_metrics(t).collect()
    assert sum(r.n_facts for r in rm) == 3        # 3 distinct facts
    ns = negative_samples(t).collect()
    keys = [(r.subj, r.pred, r.pos_obj) for r in ns]
    assert len(keys) == len(set(keys))            # one negative per fact
