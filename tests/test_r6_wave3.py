"""Round-6 wave-3 additions: conjunctive BGP matching, bounded
transitive closure, duplicated-substring spans, blocking-quality
metrics — each checked against a pure-python brute force or a
hand-checked fixture plus the operator-specific failure modes
(disconnected patterns, cyclic closures, span merging)."""

import pytest
from pyspark.sql import functions as F

P31 = 2147483647


def _triples(spark, rows):
    return spark.createDataFrame(
        [("d0", s, p, o, "t", "t", 1.0) for s, p, o in rows],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )


# ---------------------------------------------------------- conjunctive --
def test_conjunctive_triangle_hand_checked(spark):
    from gliner_spark.operators.kg_query import conjunctive_match

    t = _triples(
        spark,
        [
            ("alice", "works_at", "acme"),
            ("bob", "works_at", "acme"),
            ("acme", "based_in", "paris"),
            ("alice", "visited", "paris"),   # closes the cycle
            ("bob", "visited", "tokyo"),     # does not
            ("carol", "visited", "paris"),   # no works_at edge
        ],
    )
    out = conjunctive_match(
        t,
        [
            ("?p", "works_at", "?o"),
            ("?o", "based_in", "?l"),
            ("?p", "visited", "?l"),
        ],
    )
    assert out.columns == ["l", "o", "p"]
    assert [tuple(r) for r in out.collect()] == [("paris", "acme", "alice")]


def test_conjunctive_neq_and_constants(spark):
    from gliner_spark.operators.kg_query import conjunctive_match

    t = _triples(
        spark,
        [
            ("alice", "works_at", "acme"),
            ("bob", "works_at", "acme"),
            ("carol", "works_at", "globex"),
        ],
    )
    # colleague pairs at the SAME org, distinct people
    pairs = conjunctive_match(
        t,
        [("?p", "works_at", "?o"), ("?q", "works_at", "?o")],
        neq=[("p", "q")],
    )
    assert sorted(tuple(r) for r in pairs.collect()) == [
        ("acme", "alice", "bob"),
        ("acme", "bob", "alice"),
    ]
    # constant object: who works at acme
    at_acme = conjunctive_match(t, [("?p", "works_at", "acme")])
    assert [r.p for r in at_acme.collect()] == ["alice", "bob"]


def test_conjunctive_ground_atom_gates_existence(spark):
    from gliner_spark.operators.kg_query import conjunctive_match

    t = _triples(
        spark,
        [("alice", "works_at", "acme"), ("bob", "visited", "paris")],
    )
    hit = conjunctive_match(
        t, [("?p", "works_at", "?o"), ("bob", "visited", "paris")]
    )
    assert hit.count() == 1
    miss = conjunctive_match(
        t, [("?p", "works_at", "?o"), ("bob", "visited", "tokyo")]
    )
    assert miss.count() == 0


def test_conjunctive_rejects_disconnected(spark):
    from gliner_spark.operators.kg_query import conjunctive_match

    t = _triples(spark, [("a", "works_at", "b"), ("c", "visited", "d")])
    with pytest.raises(ValueError, match="disconnected"):
        conjunctive_match(
            t, [("?p", "works_at", "?o"), ("?x", "visited", "?y")]
        ).collect()
