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


def test_empty_triples_yield_empty_outputs(spark):
    t = _triples(spark, [])
    assert entity_degrees(t).count() == 0
    assert two_hop_paths(t).count() == 0
    assert pagerank(t).count() == 0


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


def test_random_graph_matches_python_brute_force(spark):
    """Degree / 2-hop / PageRank on a random graph vs an independent pure-
    python reimplementation of the same definitions (exact integer math,
    so equality is == not approx)."""
    import random

    from gliner_spark.operators.graph_analytics import (
        PR_DAMP,
        PR_ITERS,
        two_hop_paths,
    )

    rng = random.Random(11)
    names = [f"e{i:03d}" for i in range(40)]
    triples = list({
        (rng.choice(names), rng.choice(["r1", "r2", "r3"]), rng.choice(names))
        for _ in range(120)
    })
    t = _triples(spark, triples)

    # --- python brute force over the same distinct edge set
    edges = sorted({(s, o) for s, _, o in triples if s != o})
    out_nb = {}
    for s, d in edges:
        out_nb.setdefault(s, []).append(d)

    # degree profile over raw triples
    got_deg = {r.entity: r for r in entity_degrees(t).collect()}
    for ent, row in got_deg.items():
        assert row.out_deg == sum(1 for s, _, o in triples if s == ent)
        assert row.in_deg == sum(1 for s, _, o in triples if o == ent)
        assert row.n_pred_out == len({p for s, p, o in triples if s == ent})

    # capped 2-hop counts
    cap = 4
    ok_mid = {m for m in out_nb if len(out_nb[m]) <= cap}
    want_paths = {}
    for s, m in edges:
        if m not in ok_mid:
            continue
        for d in out_nb.get(m, []):
            if s != d:
                want_paths[(s, d)] = want_paths.get((s, d), 0) + 1
    got_paths = {
        (r.src, r.dst): r.n_paths
        for r in two_hop_paths(t, max_fanout=cap).collect()
    }
    assert got_paths == want_paths

    # integer pagerank
    nodes = sorted({x for e in edges for x in e})
    base = PR_UNIT * (1000 - PR_DAMP) // 1000
    rank = {v: PR_UNIT for v in nodes}
    for _ in range(PR_ITERS):
        contrib = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + rank[s] // len(out_nb[s])
        rank = {
            v: base + (PR_DAMP * contrib.get(v, 0)) // 1000 for v in nodes
        }
    got_rank = {r.node: r.rank for r in pagerank(t).collect()}
    assert got_rank == rank

    # integer pagerank WITH dangling-mass redistribution: sinks' total
    # rank is split DT DIV N to every node inside the damping term
    rank_d = {v: PR_UNIT for v in nodes}
    for _ in range(PR_ITERS):
        contrib = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + rank_d[s] // len(out_nb[s])
        dt = sum(rank_d[v] for v in nodes if v not in out_nb)
        share = dt // len(nodes)
        rank_d = {
            v: base + (PR_DAMP * (contrib.get(v, 0) + share)) // 1000
            for v in nodes
        }
    got_rank_d = {
        r.node: r.rank for r in pagerank(t, dangling=True).collect()
    }
    assert got_rank_d == rank_d
    # the graph has sinks, so redistribution must actually move mass
    assert any(v not in out_nb for v in nodes)
    assert got_rank_d != got_rank


def test_entity_components_match_union_find(spark):
    """entity_components vs an independent python union-find on a random
    graph (plus the disconnected-pair hand case)."""
    import random

    from gliner_spark.operators.graph_analytics import entity_components

    rng = random.Random(23)
    names = [f"e{i:03d}" for i in range(60)]
    triples = list({
        (rng.choice(names), "r", rng.choice(names)) for _ in range(45)
    })
    t = _triples(spark, triples)

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for s, _, o in triples:
        if s == o:
            continue
        nodes.update((s, o))
        a, b = find(s), find(o)
        if a != b:
            if a < b:
                parent[b] = a
            else:
                parent[a] = b
    want = {v: find(v) for v in nodes}
    sizes = {}
    for v, c in want.items():
        sizes[c] = sizes.get(c, 0) + 1

    got = entity_components(t).collect()
    assert {r.entity: r.component for r in got} == want
    assert {r.entity: r.component_size for r in got} == {
        v: sizes[c] for v, c in want.items()
    }
    # output ordering: by size desc, then component, then entity
    keys = [(-r.component_size, r.component, r.entity) for r in got]
    assert keys == sorted(keys)


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


def test_triangle_counts_match_brute_force(spark):
    """r5: per-entity triangle counts on a planted graph vs itertools
    brute force (triangle = 3 mutually connected nodes, direction
    ignored), plus the audited-cap contract."""
    from itertools import combinations

    from gliner_spark.metrics import skew_metrics
    from gliner_spark.operators.graph_analytics import triangle_counts

    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),          # triangle abc
        ("c", "d"), ("d", "e"), ("c", "e"),          # triangle cde
        ("e", "a"), ("b", "d"),                      # extra chords
        ("x", "y"),                                  # no triangle
    ]
    triples = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    und = {frozenset(e) for e in edges}
    nodes = {n for e in edges for n in e}
    expect = {}
    for tri in combinations(sorted(nodes), 3):
        a, b, c = tri
        if (
            frozenset((a, b)) in und
            and frozenset((a, c)) in und
            and frozenset((b, c)) in und
        ):
            for n in tri:
                expect[n] = expect.get(n, 0) + 1
    got = {r.entity: r.n_triangles for r in triangle_counts(triples).collect()}
    assert got == expect and expect  # planted graph HAS triangles
    # cap of 1 kills every pivot with >1 canonical edge -> no triangles,
    # and the audit reports what it dropped
    capped = triangle_counts(triples, max_fanout=1)
    assert capped.count() == 0
    sk = skew_metrics(capped)["triangle_pivot_cap"]
    assert sk["n_dropped_rows"] > 0 and sk["cap"] == 1


def test_clustering_coefficients_match_brute_force(spark):
    """r5: cc(v) = 2*T(v)/(k(v)*(k(v)-1)) on the planted graph."""
    from itertools import combinations

    from gliner_spark.operators.graph_analytics import (
        clustering_coefficients,
    )

    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("c", "d"), ("d", "e"), ("c", "e"),
        ("e", "a"), ("b", "d"), ("x", "y"),
    ]
    triples = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    und = {frozenset(e) for e in edges}
    nodes = {n for e in edges for n in e}
    tcount = {n: 0 for n in nodes}
    for tri in combinations(sorted(nodes), 3):
        if all(
            frozenset(p) in und for p in combinations(tri, 2)
        ):
            for n in tri:
                tcount[n] += 1
    kdeg = {n: sum(n in e for e in und) for n in nodes}
    got = {
        r.entity: (r.k, r.n_triangles, r.clustering, r.capped)
        for r in clustering_coefficients(triples).collect()
    }
    assert set(got) == nodes
    for n in nodes:
        k, t = kdeg[n], tcount[n]
        cc = round(2 * t / (k * (k - 1)), 6) if k >= 2 else 0.0
        # no pivot cap fires on the planted graph -> every row exact
        assert got[n] == (k, t, cc, False), (n, got[n], (k, t, cc))


def test_clustering_capped_flag_marks_lower_bounds(spark):
    """ADVICE r5: when the triangle pivot cap fires, the entities whose
    coefficients may be understated (the capped pivots + their higher-id
    canonical neighbors) must carry capped=true; unaffected entities stay
    exact and false."""
    from gliner_spark.operators.graph_analytics import (
        clustering_coefficients,
    )

    # hub 'a' has canonical degree 3 (a<b,c,d); everything else <= 2.
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
        ("x", "y"), ("y", "z"), ("x", "z"),
    ]
    triples = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    rows = {
        r.entity: r for r in
        clustering_coefficients(triples, max_fanout=2).collect()
    }
    # pivot 'a' capped -> a,b,c,d flagged; triangle abc lost (lower bound)
    assert {n: rows[n].capped for n in "abcd"} == dict.fromkeys("abcd", True)
    assert rows["a"].n_triangles == 0  # understated: abc exists but pivot capped
    # x,y,z untouched: exact triangle xyz survives, flags false
    for n in "xyz":
        assert rows[n].capped is False and rows[n].n_triangles == 1


def test_personalized_pagerank_seeds_and_reachability(spark):
    """r5 PPR: rank mass originates at the seed prefix and flows only
    along edges — nodes unreachable from any seed end with exactly 0."""
    from gliner_spark.operators.graph_analytics import pagerank

    edges = [
        ("person:a", "org:x"), ("org:x", "loc:y"),
        ("loc:z", "org:w"),  # z/w unreachable from any person
        ("person:b", "org:x"),
    ]
    triples = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    got = {r.node: r.rank for r in pagerank(triples, seed_prefix="person:").collect()}
    assert got["loc:z"] == 0 and got["org:w"] == 0
    assert got["person:a"] > 0 and got["person:b"] > 0
    assert got["org:x"] > got["loc:y"] > 0  # closer to seeds, more mass
    import pytest as _pytest

    with _pytest.raises(ValueError, match="personalized"):
        pagerank(triples, seed_prefix="person:", dangling=True)


def test_node_similarity_matches_brute_force(spark):
    """r6: per-edge neighborhood Jaccard on the planted graph vs a
    hand-computed neighbor-set intersection, plus the audited-cap
    contract (capped pivots lose their wedges -> lower-bound counts)."""
    from gliner_spark.metrics import skew_metrics
    from gliner_spark.operators.graph_analytics import node_similarity

    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("c", "d"), ("d", "e"), ("c", "e"),
        ("e", "a"), ("b", "d"), ("x", "y"),
    ]
    triples = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    und = {tuple(sorted(e)) for e in edges}
    nbrs = {}
    for s, o in und:
        nbrs.setdefault(s, set()).add(o)
        nbrs.setdefault(o, set()).add(s)
    got = {
        (r.a, r.b): (r.common, r.k_a, r.k_b, r.jaccard)
        for r in node_similarity(triples).collect()
    }
    assert set(got) == und
    for a, b in und:
        common = len(nbrs[a] & nbrs[b])
        ka, kb = len(nbrs[a]), len(nbrs[b])
        jac = round(common / (ka + kb - common), 6)
        assert got[(a, b)] == (common, ka, kb, jac), (a, b, got[(a, b)])
    # cap of 1 excludes every pivot with degree > 1 -> all commons 0,
    # audit records the drop
    capped = node_similarity(triples, max_fanout=1)
    rows = capped.collect()
    assert all(r.common == 0 for r in rows)
    sk = skew_metrics(capped)["nodesim_pivot_cap"]
    assert sk["n_dropped_rows"] > 0 and sk["cap"] == 1


def test_kcore_multi_round_peeling_matches_brute_force(spark):
    """r6: k-core on a planted clique + pendant chain — the chain forces
    CASCADING removals (peel depth 3, exercising the iteration), the
    clique survives with its inside-core degrees; plus the convergence
    raise on an over-tight round bound."""
    import pytest

    from gliner_spark.operators.graph_analytics import kcore

    # 4-clique abcd; chain d-e-f-g peels g -> f -> e at k=2
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"), ("d", "e"), ("e", "f"), ("f", "g"),
    ]
    triples = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )

    def brute(k):
        und = {tuple(sorted(e)) for e in edges}
        while True:
            deg = {}
            for x, y in und:
                deg[x] = deg.get(x, 0) + 1
                deg[y] = deg.get(y, 0) + 1
            bad = {n for n, d in deg.items() if d < k}
            if not bad:
                return deg
            und = {e for e in und if e[0] not in bad and e[1] not in bad}

    for k in (2, 3, 4):
        want = brute(k)
        got = {r.entity: r.core_degree for r in kcore(triples, k=k).collect()}
        assert got == want, (k, got, want)
    # k=2 core is exactly the clique, every survivor at full degree 3
    assert set(brute(2)) == set("abcd")
    # peel depth 3 exceeds a 2-round bound -> the convergence contract fires
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(triples, k=2, max_rounds=2)


def test_ktruss_edge_peeling_matches_brute_force(spark):
    """r6: k-truss on a planted 4-clique + triangle fringe — at k=4 the
    fringe peels in CASCADE (removing (c,e)/(d,f)/(e,f) drops (d,e)'s
    support from 2 to 0, so it only falls in round 2), exercising
    genuine multi-round edge peeling; plus the convergence raise on an
    over-tight round bound."""
    import pytest

    from gliner_spark.operators.graph_analytics import ktruss

    # 4-clique abcd; e adjacent to c,d; f adjacent to d,e; pendant f-g.
    # k=4 peel: round 1 drops (c,e),(d,f),(e,f),(f,g) (support<=1) but
    # (d,e) still closes 2 triangles {c,f}; round 2 drops (d,e).
    clique = [
        (x, y)
        for i, x in enumerate("abcd")
        for y in "abcd"[i + 1:]
    ]
    edges = clique + [
        ("c", "e"), ("d", "e"), ("d", "f"), ("e", "f"), ("f", "g"),
    ]
    triples = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )

    def brute(k):
        und = {tuple(sorted(e)) for e in edges}
        while True:
            sup = {e: 0 for e in und}
            for a, b in und:
                for c in {x for e in und for x in e}:
                    if tuple(sorted((a, c))) in und and \
                            tuple(sorted((b, c))) in und:
                        sup[(a, b)] += 1
            bad = {e for e, s in sup.items() if s < k - 2}
            if not bad:
                return sup
            und -= bad

    for k in (3, 4, 5):
        want = brute(k)
        got = {(r.a, r.b): r.support for r in ktruss(triples, k=k).collect()}
        assert got == want, (k, got, want)
    # k=4 truss is exactly the clique (cascade removed the whole fringe)
    assert set(brute(4)) == {tuple(sorted(e)) for e in clique}
    # k=3 keeps the fringe triangles but peels the pendant f-g
    assert ("d", "f") in brute(3) and ("f", "g") not in brute(3)
    # k=5 peels everything (4-clique edges close only 2 triangles)
    assert brute(5) == {} and ktruss(triples, k=5).count() == 0
    # the k=4 cascade peels in 2 rounds: max_rounds=2 converges (the
    # bound allows depth == max_rounds, plus one confirmation round),
    # while a 1-round bound dies mid-cascade
    assert ktruss(triples, k=4, max_rounds=2).count() > 0
    with pytest.raises(RuntimeError, match="did not converge"):
        ktruss(triples, k=4, max_rounds=1)


def test_link_prediction_matches_brute_force(spark):
    """r6: RA-scored non-edges on the planted graph vs a hand loop —
    integer micro-unit scores, non-adjacency, and the (score DESC, a, b)
    global ordering."""
    from itertools import combinations

    from gliner_spark.operators.graph_analytics import (
        LP_UNIT,
        link_prediction,
    )

    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("c", "d"), ("d", "e"), ("c", "e"),
        ("e", "a"), ("b", "d"), ("x", "y"),
    ]
    triples = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    und = {tuple(sorted(e)) for e in edges}
    nbrs = {}
    for s, o in und:
        nbrs.setdefault(s, set()).add(o)
        nbrs.setdefault(o, set()).add(s)
    want = {}
    for a, b in combinations(sorted(nbrs), 2):
        if (a, b) in und:
            continue
        common = nbrs[a] & nbrs[b]
        if common:
            want[(a, b)] = (
                len(common), sum(LP_UNIT // len(nbrs[c]) for c in common)
            )
    rows = link_prediction(triples).collect()
    got = {(r.a, r.b): (r.common, r.ra_score) for r in rows}
    assert got == want and want
    # ordering: score desc, then (a, b) asc
    keys = [(-r.ra_score, r.a, r.b) for r in rows]
    assert keys == sorted(keys)
    # predicted links are genuinely absent from the graph
    assert all(p not in und for p in got)


def test_bfs_distances_match_brute_force(spark):
    """r6: seeded level-synchronous BFS on a planted DIRECTED graph —
    min-hop distances, depth bound, direction respected, unreachable
    nodes absent."""
    from collections import deque

    from gliner_spark.operators.graph_analytics import bfs_distances

    edges = [
        ("person:a", "org:x"), ("org:x", "loc:y"), ("loc:y", "org:z"),
        ("org:z", "loc:w"), ("loc:w", "org:far"),   # chain depth 5 from a
        ("person:b", "org:z"),                       # shortcut: z at 1
        ("loc:iso", "org:island"),                   # unreachable island
        ("org:x", "person:a"),                       # cycle back
    ]
    triples = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )

    def brute(depth):
        adj = {}
        nodes = set()
        for s, o in edges:
            adj.setdefault(s, []).append(o)
            nodes.update((s, o))
        dist = {n: 0 for n in nodes if n.startswith("person:")}
        q = deque(dist)
        while q:
            u = q.popleft()
            if dist[u] >= depth:
                continue
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    for depth in (2, 4):
        want = brute(depth)
        got = {
            r.node: r.dist
            for r in bfs_distances(triples, depth=depth).collect()
        }
        assert got == want, (depth, got, want)
    # min-hop: org:z reachable at 3 via a but 1 via b -> 1
    assert brute(4)["org:z"] == 1
    # the island never appears; org:far needs 3 hops (w at 2 via b)
    assert "org:island" not in brute(4) and brute(4)["org:far"] == 3


def test_wl_colors_matches_brute_force(spark):
    """r6: 1-WL refinement on a path + star (same type prefix, so init
    colors are equal) vs a hand loop with fold_hash_py — symmetric
    positions converge to the same color, structurally distinct ones
    split, and class sizes count the final partition."""
    from gliner_spark.core.dense import fold_hash_py
    from gliner_spark.functions.text import FOLD_M, P31
    from gliner_spark.operators.graph_analytics import WL_ROUNDS, wl_colors

    # path a-b-c-d-e and star x-(p,q,r), all entities typed "t:"
    edges = [
        ("t:a", "t:b"), ("t:b", "t:c"), ("t:c", "t:d"), ("t:d", "t:e"),
        ("t:x", "t:p"), ("t:x", "t:q"), ("t:x", "t:r"),
    ]
    triples = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    und = {tuple(sorted(e)) for e in edges}
    nbrs = {}
    for s, o in und:
        nbrs.setdefault(s, set()).add(o)
        nbrs.setdefault(o, set()).add(s)
    colors = {n: fold_hash_py(n.split(":")[0]) for n in nbrs}
    for _ in range(WL_ROUNDS):
        nxt = {}
        for n in nbrs:
            acc = 0
            for c in sorted(colors[m] for m in nbrs[n]):
                acc = (acc * FOLD_M + c) % P31
            nxt[n] = (colors[n] * FOLD_M + acc) % P31
        colors = nxt
    rows = wl_colors(triples).collect()
    got = {r.entity: r.wl_color for r in rows}
    assert got == colors, (got, colors)
    # symmetric positions share a color, distinct roles split
    assert got["t:a"] == got["t:e"] and got["t:b"] == got["t:d"]
    assert got["t:p"] == got["t:q"] == got["t:r"]
    assert len({got["t:c"], got["t:x"], got["t:a"], got["t:b"],
                got["t:p"]}) == 5
    # class_size counts the final partition
    sizes = {r.entity: r.class_size for r in rows}
    assert sizes["t:p"] == 3 and sizes["t:a"] == 2 and sizes["t:c"] == 1


def test_degree_histogram_hand_checked(spark):
    """r6: log2 buckets on a star + path — bit-length bucketing, exact
    per-bucket min/max/count/sum, and lo/hi bounds."""
    from gliner_spark.operators.graph_analytics import degree_histogram

    # star x-(p1..p5): x deg 5 (bucket 2), leaves deg 1 (bucket 0);
    # path a-b-c: b deg 2 (bucket 1), a,c deg 1
    edges = [("x", f"p{i}") for i in range(5)] + [("a", "b"), ("b", "c")]
    t = spark.createDataFrame(
        [("d0", s, "rel", o, "t", "t", 1.0) for s, o in edges],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    rows = {r.bucket: r for r in degree_histogram(t).collect()}
    assert set(rows) == {0, 1, 2}
    b0, b1, b2 = rows[0], rows[1], rows[2]
    assert (b0.lo, b0.hi, b0.n_entities, b0.sum_degree) == (1, 1, 7, 7)
    assert (b1.lo, b1.hi, b1.n_entities, b1.sum_degree) == (2, 3, 1, 2)
    assert (b2.lo, b2.hi, b2.min_degree, b2.max_degree, b2.n_entities) == \
        (4, 7, 5, 5, 1)
    # histogram covers every node exactly once
    assert sum(r.n_entities for r in rows.values()) == 9
    assert sum(r.sum_degree for r in rows.values()) == 2 * len(edges)


def test_harmonic_centrality_matches_brute_force(spark):
    """r6: seed-sampled harmonic centrality on a random graph vs a hand
    BFS loop — deterministic hash-ordered seed pick, min-hop distances,
    integer HC_UNIT DIV dist sums, (harmonic DESC, entity) ordering."""
    import random
    from collections import deque

    from gliner_spark.core.dense import fold_hash_py
    from gliner_spark.operators.graph_analytics import (
        HC_UNIT,
        harmonic_centrality,
    )

    rng = random.Random(7)
    names = [f"e{i:03d}" for i in range(40)]
    triples = list({
        (rng.choice(names), "r", rng.choice(names)) for _ in range(70)
    })
    t = spark.createDataFrame(
        [("d0", s, p, o, "t", "t", 1.0) for s, p, o in triples],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    und = {tuple(sorted((s, o))) for s, _, o in triples if s != o}
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    n_seeds, depth = 5, 3
    seeds = sorted(nbrs, key=lambda n: (fold_hash_py(n), n))[:n_seeds]
    want = {}
    reached = {}
    for s in seeds:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            if dist[u] >= depth:
                continue
            for v in nbrs[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for v, d in dist.items():
            if d > 0:
                want[v] = want.get(v, 0) + HC_UNIT // d
                reached[v] = reached.get(v, 0) + 1
    rows = harmonic_centrality(t, n_seeds=n_seeds, depth=depth).collect()
    assert {r.entity: r.harmonic for r in rows} == want
    assert {r.entity: r.n_seeds_reached for r in rows} == reached
    keys = [(-r.harmonic, r.entity) for r in rows]
    assert keys == sorted(keys)
    # seeds themselves are scored by the OTHER seeds that reach them
    assert any(s in want for s in seeds)
