"""Graph-analytics operators over canonical triples (degree / 2-hop /
integer PageRank) — hand-checked invariants on a crafted graph plus
partitioning determinism (the integer-arithmetic guarantee)."""

from gliner_spark.operators.graph_analytics import (
    PR_UNIT,
    entity_degrees,
    pagerank,
    two_hop_paths,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        [("d0", s, p, o, "t", "t", 1.0) for s, p, o in rows],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )


def test_degree_profile_hand_checked(spark):
    t = _triples(spark, [
        ("a", "r1", "b"), ("a", "r2", "b"), ("a", "r1", "c"), ("b", "r1", "c"),
    ])
    rows = {r.entity: r for r in entity_degrees(t).collect()}
    assert rows["a"].out_deg == 3 and rows["a"].in_deg == 0
    assert rows["a"].n_pred_out == 2
    assert rows["b"].out_deg == 1 and rows["b"].in_deg == 2
    assert rows["c"].in_deg == 2 and rows["c"].out_deg == 0
    # every triple counted exactly once per direction
    assert sum(r.out_deg for r in rows.values()) == 4
    assert sum(r.in_deg for r in rows.values()) == 4


def test_two_hop_counts_and_fanout_cap(spark):
    # a->b->c and a->b->d; x is a hub mid above the cap
    hub = [("x", "r", f"y{i}") for i in range(5)] + [("w", "r", "x")]
    t = _triples(
        spark, [("a", "r", "b"), ("b", "r", "c"), ("b", "r", "d")] + hub
    )
    got = {(r.src, r.dst): r.n_paths for r in two_hop_paths(t, max_fanout=3).collect()}
    assert got[("a", "c")] == 1 and got[("a", "d")] == 1
    # w->x->yi paths excluded: x's fan-out (5) exceeds the cap (3)
    assert not any(s == "w" for s, _ in got)


def test_pagerank_sink_outranks_source_and_is_deterministic(spark):
    t = _triples(spark, [("a", "r", "c"), ("b", "r", "c"), ("c", "r", "d")])
    r1 = {r.node: r.rank for r in pagerank(t).collect()}
    r2 = {
        r.node: r.rank
        for r in pagerank(
            _triples(spark, [("a", "r", "c"), ("b", "r", "c"), ("c", "r", "d")])
            .repartition(13)
        ).collect()
    }
    assert r1 == r2
    # two sources feed c; c feeds d: c must outrank the sources
    assert r1["c"] > r1["a"] == r1["b"]
    # sources receive no mass: rank = (1-d) * UNIT exactly
    assert r1["a"] == PR_UNIT * 150 // 1000
