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


# -------------------------------------------------------------- closure --
def _closure_brute(edges, maxd):
    """BFS min-depth over directed edges, bounded depth."""
    from collections import deque

    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
    out = {}
    for src in adj:
        seen = {src: 0}
        q = deque([src])
        while q:
            n = q.popleft()
            if seen[n] >= maxd:
                continue
            for m in adj.get(n, ()):
                if m not in seen:
                    seen[m] = seen[n] + 1
                    q.append(m)
        for dst, d in seen.items():
            if dst != src and d:
                out[(src, dst)] = d
    return out


def test_transitive_closure_matches_brute_with_cycle(spark):
    from gliner_spark.operators.graph_analytics import transitive_closure

    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
        ("b", "a"),          # 2-cycle
        ("x", "a"),          # feeds into the cycle
        ("c", "c"),          # self-loop, must be ignored
    ]
    t = _triples(spark, [(s, "acquired", d) for s, d in edges])
    got = {
        (r.src, r.dst): r.min_depth
        for r in transitive_closure(t, max_depth=4).collect()
    }
    assert got == _closure_brute(edges, 4)
    # depth bound respected: a->f needs 5 hops, absent at max_depth=4
    assert ("a", "f") not in got and got[("a", "e")] == 4
    # cycle resolved, no self-return pairs in the output
    assert all(s != d for s, d in got)


def test_transitive_closure_early_exit_on_converged(spark):
    from gliner_spark.operators.graph_analytics import transitive_closure

    t = _triples(spark, [("a", "acquired", "b")])
    got = [tuple(r) for r in transitive_closure(t, max_depth=4).collect()]
    assert got == [("a", "b", 1)]


# ----------------------------------------------------------- substrings --
def _substr_brute(docs, L, min_docs):
    """Duplicated-window positions + island merge, pure python."""
    grams = {}
    pos_by_doc = {}
    for did, text in docs:
        t = text.split(" ")
        for p in range(len(t) - L + 1):
            g = " ".join(t[p : p + L])
            grams.setdefault(g, set()).add(did)
            pos_by_doc.setdefault(did, []).append((p, g))
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    spans = []
    for did in sorted(pos_by_doc):
        hits = sorted(p for p, g in pos_by_doc[did] if g in dup)
        i = 0
        while i < len(hits):
            j = i
            while j + 1 < len(hits) and hits[j + 1] - hits[j] <= L - 1:
                j += 1
            spans.append((did, hits[i], hits[j] + L - 1, j - i + 1))
            i = j + 1
    return spans


def test_duplicated_substring_spans_brute(spark):
    from gliner_spark.operators.dedup import duplicated_substring_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        ("d0", f"alpha beta {shared} gamma delta epsilon zeta eta theta"),
        ("d1", f"one two three {shared} four five six seven eight nine"),
        # d2 repeats the shared block twice -> two islands or one merged
        ("d2", f"{shared} filler filler2 filler3 {shared}"),
        # d3 shares nothing long enough
        ("d3", "completely different words without any common window here"),
        # d4 too short for a window
        ("d4", "tiny doc"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = [
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in duplicated_substring_spans(df, gram_len=6).collect()
    ]
    want = _substr_brute(docs, 6, 2)
    assert got == want
    assert any(r[0] == "d2" for r in got)
    assert not any(r[0] in ("d3", "d4") for r in got)


def test_duplicated_substring_spans_merges_overlaps(spark):
    from gliner_spark.operators.dedup import duplicated_substring_spans

    # d0/d1 share two overlapping 4-windows "a b c d" and "b c d e"
    # (positions 0 and 1 in d0) -> ONE maximal span 0..4 with 2 grams
    docs = [
        ("d0", "a b c d e x y z"),
        ("d1", "q a b c d e r s"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r.doc_id: (r.span_start, r.span_end, r.n_grams)
        for r in duplicated_substring_spans(df, gram_len=4).collect()
    }
    assert got == {"d0": (0, 4, 2), "d1": (1, 5, 2)}


# ------------------------------------------------------------- blocking --
def test_blocking_quality_planted_duplicate(spark):
    """A planted duplicate pair among vocab-disjoint docs must be the
    only true pair and a found candidate: completeness 1000 permille
    at every threshold, in both item spaces."""
    from gliner_spark.operators.dedup import blocking_quality

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [("d0", dup), ("d1", dup)] + [
        (f"x{i}", " ".join(f"w{i}_{j}" for j in range(10))) for i in range(6)
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    for space in ("token", "shingle"):
        rows = blocking_quality(df, item_space=space).collect()
        assert len(rows) == 4
        for r in rows:
            assert r.n_docs == 8 and r.n_pairs_total == 28
            assert r.n_true == 1 and r.n_hit == 1
            assert r.pairs_completeness_permille == 1000
            assert r.reduction_ratio_permille >= 900


def test_staged_shingle_ids_match_gram_postings(spark):
    from gliner_spark.operators.dedup import staged_shingle_ids
    from gliner_spark.operators.text_analysis import gram_postings

    df = spark.createDataFrame(
        [("d0", "a b c d e"), ("d1", "x y")], "doc_id string, text string"
    )
    staged = {
        r.doc_id: list(r._ids) for r in staged_shingle_ids(df).collect()
    }
    posted = {}
    for r in gram_postings(df).collect():
        posted.setdefault(r.doc_id, []).append((r.pos, r.gh))
    assert staged["d0"] == [g for _, g in sorted(posted["d0"])]
    assert staged["d1"] == [] and "d1" not in posted


def test_blocking_quality_rejects_unknown_space(spark):
    from gliner_spark.operators.dedup import blocking_quality

    df = spark.createDataFrame([("d0", "a b")], "doc_id string, text string")
    with pytest.raises(ValueError, match="item_space"):
        blocking_quality(df, item_space="chars")


# ------------------------------------------------------------ maintenance --
def _mt(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )


def test_snapshot_diff_statuses_and_support(spark):
    from gliner_spark.operators.kg_maintenance import snapshot_diff

    old = _mt(spark, [
        ("doc-0000000001", "a", "p", "x", "t", "t", 1.0),
        ("doc-0000000002", "a", "p", "x", "t", "t", 1.0),   # support 2
        ("doc-0000000001", "b", "p", "y", "t", "t", 1.0),   # removed
        ("doc-0000000001", "b", "p", "y", "t", "t", 0.9),   # same doc dup
    ])
    new = _mt(spark, [
        ("doc-0000000003", "a", "p", "x", "t", "t", 1.0),   # kept, support 1
        ("doc-0000000003", "c", "p", "z", "t", "t", 1.0),   # added
    ])
    got = {(r.subj, r.pred, r.obj): r for r in snapshot_diff(old, new).collect()}
    assert got[("a", "p", "x")].status == "kept"
    assert (got[("a", "p", "x")].n_docs_old,
            got[("a", "p", "x")].n_docs_new,
            got[("a", "p", "x")].support_delta) == (2, 1, -1)
    assert got[("b", "p", "y")].status == "removed"
    assert got[("b", "p", "y")].n_docs_old == 1  # same-doc dup counted once
    assert got[("c", "p", "z")].status == "added"
    assert got[("c", "p", "z")].support_delta == 1


def test_fact_timeline_recency_and_tiebreak(spark):
    from gliner_spark.operators.kg_maintenance import fact_timeline

    t = _mt(spark, [
        ("doc-0000000001", "a", "p", "x", "t", "t", 1.0),
        ("doc-0000000005", "a", "p", "x", "t", "t", 1.0),
        ("doc-0000000003", "a", "p", "y", "t", "t", 1.0),
        # tie on last_seen between y2/y1 at doc 7 -> larger obj wins
        ("doc-0000000007", "b", "q", "y1", "t", "t", 1.0),
        ("doc-0000000007", "b", "q", "y2", "t", "t", 1.0),
    ])
    got = {(r.subj, r.pred, r.obj): r for r in fact_timeline(t).collect()}
    ax = got[("a", "p", "x")]
    assert (ax.first_seen, ax.last_seen, ax.n_docs, ax.is_current) == (1, 5, 2, 1)
    assert got[("a", "p", "y")].is_current == 0
    assert got[("b", "q", "y2")].is_current == 1
    assert got[("b", "q", "y1")].is_current == 0


# --------------------------------------------------------------- egonet --
def test_egonet_induced_subgraph(spark):
    """Directed 2-hop ego of 'person:' seeds: facts with both endpoints
    distanced; facts touching out-of-neighborhood nodes are excluded."""
    from gliner_spark.operators.graph_analytics import egonet

    t = _triples(spark, [
        ("person:a", "works_at", "org:x"),      # 0 -> 1
        ("org:x", "based_in", "loc:p"),         # 1 -> 2
        ("loc:p", "near", "loc:q"),             # 2 -> 3: q outside depth 2
        ("org:far", "based_in", "loc:r"),       # disconnected from seeds
        ("org:x", "acquired", "org:x2"),        # 1 -> 2
    ])
    got = {
        (r.subj, r.pred, r.obj): (r.dist_subj, r.dist_obj)
        for r in egonet(t).collect()
    }
    assert got == {
        ("person:a", "works_at", "org:x"): (0, 1),
        ("org:x", "based_in", "loc:p"): (1, 2),
        ("org:x", "acquired", "org:x2"): (1, 2),
    }


# -------------------------------------------------------------- ranking --
def test_ranking_metrics_brute(spark):
    """Filtered sampled-pool ranking: MRR/Hits from a pure-python
    replay of pools, filtering, energies and strict-better ranks."""
    P = 2147483647

    def fold(s):
        h = 0
        for ch in s:
            h = (h * 1000003 + ord(ch)) % P
        return h

    def emb(name, dim=8):
        base = fold(name)
        return [
            ((((base * (j * 2 + 5) + j) % P) % 256) * 2 - 255) / 256.0
            for j in range(dim)
        ]

    def l1(h, r, t):
        return sum(abs(h[i] + r[i] - t[i]) for i in range(8))

    from gliner_spark.operators.kg_completion import ranking_metrics

    rows = [
        ("d0", "a", "likes", "x", "person", "fruit", 1.0),
        ("d0", "a", "likes", "y", "person", "fruit", 1.0),
        ("d1", "b", "likes", "x", "person", "fruit", 1.0),
        ("d1", "b", "visited", "p", "person", "place", 1.0),
        ("d2", "c", "visited", "q", "person", "place", 1.0),
        ("d2", "c", "visited", "x2", "person", "fruit", 1.0),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    pos = sorted({(s, p, o, ot) for _, s, p, o, _, ot, _ in rows})
    trues = {(s, p, o) for _, s, p, o, _, _, _ in rows}
    pools = {}
    for _, _, _, o, _, ot, _ in rows:
        pools.setdefault(ot, set()).add(o)
    stats = {}
    for s, p, o, ot in pos:
        pool = sorted(pools[ot], key=lambda e: (fold(e), e))[:64]
        e_pos = l1(emb(s), emb(p), emb(o))
        n_better = sum(
            1
            for c in pool
            if c != o
            and (s, p, c) not in trues
            and l1(emb(s), emb(p), emb(c)) < e_pos
        )
        rank = 1 + n_better
        n, mrr, h1, h3, h10 = stats.get(p, (0, 0, 0, 0, 0))
        stats[p] = (
            n + 1, mrr + 1000000 // rank,
            h1 + (rank <= 1), h3 + (rank <= 3), h10 + (rank <= 10),
        )
    got = {r.pred: r for r in ranking_metrics(t).collect()}
    assert set(got) == set(stats)
    for p, (n, mrr, h1, h3, h10) in stats.items():
        r = got[p]
        assert r.n_facts == n
        assert r.mrr_micro == mrr // n
        assert r.hits1_permille == 1000 * h1 // n
        assert r.hits3_permille == 1000 * h3 // n
        assert r.hits10_permille == 1000 * h10 // n
