"""Round-6 additions: synchronous LPA communities, HyperLogLog distinct
registers, and winnowing fingerprints — each checked against an
independent pure-python brute force (exact integer math, so equality is
== not approx) plus the operator-specific invariants (community split,
register mergeability, winnowing coverage guarantee)."""

import random

from pyspark.sql import functions as F

P31 = 2147483647


def _fold(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 1000003 + ord(ch)) % P31
    return h


def _triples(spark, rows):
    return spark.createDataFrame(
        [("d0", s, p, o, "t", "t", 1.0) for s, p, o in rows],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )


# ------------------------------------------------------------------ LPA --
def _lpa_brute(edges, rounds):
    """Synchronous plurality-label propagation, min-label ties."""
    und = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lbl = {n: n for n in nbrs}
    for _ in range(rounds):
        nxt = {}
        for n, ns in nbrs.items():
            cnt = {}
            for m in ns:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            nxt[n] = min(
                cnt, key=lambda c: (-cnt[c], c)
            )  # plurality, min-label tie
        if nxt == lbl:
            break
        lbl = nxt
    return lbl


def test_lpa_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge resolve to exactly two
    communities, each the lexicographic min of its clique."""
    from gliner_spark.operators.graph_analytics import lpa_communities

    left = [f"a{i}" for i in range(4)]
    right = [f"b{i}" for i in range(4)]
    rows = [
        (x, "r", y) for grp in (left, right) for x in grp for y in grp if x < y
    ] + [("a0", "r", "b0")]
    got = {
        r.entity: r.community
        for r in lpa_communities(_triples(spark, rows)).collect()
    }
    assert all(got[x] == "a0" for x in left)
    assert all(got[x] == "b0" for x in right)


def test_lpa_matches_brute_force(spark):
    from gliner_spark.operators.graph_analytics import (
        LPA_ROUNDS,
        lpa_communities,
    )

    rng = random.Random(23)
    names = [f"e{i:03d}" for i in range(40)]
    triples = list(
        {
            (rng.choice(names), "r", rng.choice(names))
            for _ in range(90)
        }
    )
    want = _lpa_brute([(s, o) for s, _, o in triples], LPA_ROUNDS)
    got = {
        r.entity: r.community
        for r in lpa_communities(_triples(spark, triples)).collect()
    }
    assert got == want


# ------------------------------------------------------------------ HLL --
def _hll_brute(values):
    """(registers, sumpow, est) from the same integer spec."""
    from gliner_spark.operators.sketches import (
        HLL_EST_NUM,
        HLL_M,
        HLL_MIX_A,
        HLL_REST_BITS,
    )

    regs = {}
    for v in set(values):
        h0 = _fold(v)
        h = ((h0 * h0) % P31 * HLL_MIX_A + h0) % P31
        bucket, rest = h % HLL_M, h // HLL_M
        rho = HLL_REST_BITS + 1 - rest.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    sumpow = sum(1 << (HLL_REST_BITS + 1 - m) for m in regs.values())
    sumpow += (HLL_M - len(regs)) * (1 << (HLL_REST_BITS + 1))
    est = (HLL_EST_NUM // sumpow) // 1_000_000
    return regs, sumpow, est


def test_hll_registers_and_estimate_match_brute_force(spark):
    from gliner_spark.operators.sketches import hll_build, hll_distinct

    objs = [f"obj-{i}" for i in range(500)]
    rows = [("s", "p1", o) for o in objs for _ in range(2)] + [
        ("s", "p2", f"x-{i}") for i in range(40)
    ]
    t = _triples(spark, rows)

    regs1, _, est1 = _hll_brute(objs)
    regs2, _, est2 = _hll_brute([f"x-{i}" for i in range(40)])
    got_regs = {
        (r.pred, r.bucket): r.m for r in hll_build(t).collect()
    }
    assert got_regs == {
        **{("p1", b): m for b, m in regs1.items()},
        **{("p2", b): m for b, m in regs2.items()},
    }
    got = {r.pred: r for r in hll_distinct(t).collect()}
    assert got["p1"].n_exact == 500 and got["p2"].n_exact == 40
    assert got["p1"].hll_est == est1 and got["p2"].hll_est == est2
    # raw HLL operating regime: within ~3 sigma of 1.04/sqrt(64)
    assert abs(got["p1"].hll_est - 500) <= 500 * 0.40


def test_hll_registers_merge_by_max(spark):
    """Registers of two disjoint halves merged cell-wise by MAX equal the
    registers of the union — the 100 TB / streaming mergeability
    contract."""
    from gliner_spark.operators.sketches import hll_build

    a = [("s", "p", f"v{i}") for i in range(200)]
    b = [("s", "p", f"w{i}") for i in range(200)]
    whole = {
        (r.bucket): r.m
        for r in hll_build(_triples(spark, a + b)).collect()
    }
    ra = hll_build(_triples(spark, a))
    rb = hll_build(_triples(spark, b))
    merged = {
        r.bucket: r.m
        for r in ra.unionByName(rb)
        .groupBy("pred", "bucket")
        .agg(F.max("m").alias("m"))
        .collect()
    }
    assert merged == whole


# ------------------------------------------------------------ winnowing --
def _winnow_brute(tokens, k, w, pos_bits):
    ids = [_fold(t) for t in tokens]
    if len(ids) < k:
        return set()
    grams = []
    for i in range(len(ids) - k + 1):
        g = 0
        for x in ids[i : i + k]:
            g = (g * 131 + x) % P31
        grams.append(g)
    cap = 1 << pos_bits
    starts = (
        range(len(grams) - w + 1) if len(grams) >= w else [0]
    )
    out = set()
    for s in starts:
        window = grams[s : s + w]
        key = min(
            g * cap + (cap - 1 - (s + j)) for j, g in enumerate(window)
        )
        out.add((cap - 1 - key % cap, key // cap))
    return out


def test_winnowing_matches_brute_force(spark):
    from gliner_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_POS_BITS,
        WINNOW_W,
        winnow_fingerprints,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (f"d{i}", " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        (r.doc_id, r.fp_pos, r.fp)
        for r in winnow_fingerprints(df).collect()
    }
    want = {
        (d, p, f)
        for d, text in docs
        for p, f in _winnow_brute(
            text.split(" "), WINNOW_K, WINNOW_W, WINNOW_POS_BITS
        )
    }
    assert got == want


def test_winnowing_coverage_guarantee(spark):
    """Any shared run of >= w+k-1 tokens yields at least one common
    fingerprint HASH between the two documents (the paper's guarantee)."""
    from gliner_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    shared = " ".join(f"s{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    docs = [
        ("da", "alpha beta " + shared + " gamma"),
        ("db", "x y z " + shared),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = winnow_fingerprints(df).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps["da"] & fps["db"]


# -------------------------------------------------- winnow overlap pairs --
def test_winnow_overlap_pairs_match_brute_force(spark):
    from gliner_spark.operators.dedup import (
        WINNOW_BUCKET_CAP,
        WINNOW_MIN_SHARED,
        winnow_overlap_pairs,
    )
    from gliner_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_POS_BITS,
        WINNOW_W,
    )

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(8)]
    shared = " ".join(rng.choice(vocab) for _ in range(12))
    docs = [
        ("d0", shared + " tail one"),
        ("d1", "head " + shared),
        ("d2", " ".join(rng.choice(vocab) for _ in range(15))),
        ("d3", shared + " " + shared),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")

    postings = {}
    for d, text in docs:
        for _, f in _winnow_brute(
            text.split(" "), WINNOW_K, WINNOW_W, WINNOW_POS_BITS
        ):
            postings.setdefault(f, set()).add(d)
    pairs = {}
    for f, ds in postings.items():
        if len(ds) > WINNOW_BUCKET_CAP:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs[(ds[i], ds[j])] = pairs.get((ds[i], ds[j]), 0) + 1
    want = {p: c for p, c in pairs.items() if c >= WINNOW_MIN_SHARED}
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_overlap_pairs(df).collect()
    }
    assert got == want
    assert ("d0", "d1") in got  # the planted shared run is detected


def test_winnow_bucket_cap_drops_boilerplate_fingerprints(spark):
    """A fingerprint shared by > cap docs must generate NO pairs."""
    from gliner_spark.operators.dedup import winnow_overlap_pairs

    boiler = "a b c d e f"
    docs = [(f"d{i}", boiler) for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    assert winnow_overlap_pairs(df, min_shared=1, bucket_cap=3).count() == 0
    # under the cap the same docs all pair up (C(5,2) = 10)
    assert winnow_overlap_pairs(df, min_shared=1, bucket_cap=10).count() == 10


# ------------------------------------------------------------ modularity --
def test_modularity_matches_brute_force(spark):
    from gliner_spark.operators.graph_analytics import (
        LPA_ROUNDS,
        partition_modularity,
    )

    rng = random.Random(31)
    names = [f"e{i:03d}" for i in range(30)]
    triples = list(
        {(rng.choice(names), "r", rng.choice(names)) for _ in range(70)}
    )
    edges = sorted(
        {(min(s, o), max(s, o)) for s, _, o in triples if s != o}
    )
    lbl = _lpa_brute(edges, LPA_ROUNDS)
    m = len(edges)
    deg, e_c, d_c, n_c = {}, {}, {}, {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        if lbl[a] == lbl[b]:
            e_c[lbl[a]] = e_c.get(lbl[a], 0) + 1
    for node, c in lbl.items():
        d_c[c] = d_c.get(c, 0) + deg[node]
        n_c[c] = n_c.get(c, 0) + 1
    want = {
        c: (
            n_c[c],
            e_c.get(c, 0),
            d_c[c],
            round((4 * m * e_c.get(c, 0) - d_c[c] ** 2) / (4 * m * m), 6),
        )
        for c in n_c
    }
    got = {
        r.community: (r.n_nodes, r.e_intra, r.d_total, r.q_contrib)
        for r in partition_modularity(_triples(spark, triples)).collect()
    }
    assert got == want
    # Q = sum of contributions is a sane modularity value
    q = sum(v[3] for v in got.values())
    assert -0.5 <= q <= 1.0


def test_modularity_two_cliques_is_high(spark):
    """The barbell partition (two 4-cliques, one bridge) has Q close to
    the theoretical value for a clean 2-community split."""
    from gliner_spark.operators.graph_analytics import partition_modularity

    left = [f"a{i}" for i in range(4)]
    right = [f"b{i}" for i in range(4)]
    rows = [
        (x, "r", y) for grp in (left, right) for x in grp for y in grp if x < y
    ] + [("a0", "r", "b0")]
    out = partition_modularity(_triples(spark, rows)).collect()
    assert {r.community for r in out} == {"a0", "b0"}
    q = sum(r.q_contrib for r in out)
    # m=13, per side e=6, d=13 -> q_c = (4*13*6 - 169)/676 each; Q ~ 0.423
    assert abs(q - 2 * round((4 * 13 * 6 - 169) / 676, 6)) < 1e-9


# --------------------------------------------------------- schema profile --
def test_schema_profile_hand_checked(spark):
    from gliner_spark.operators.graph_analytics import schema_profile

    rows = [
        ("d0", "a", "works_at", "x", "person", "org", 1.0),
        ("d0", "b", "works_at", "x", "person", "org", 1.0),
        ("d1", "a", "works_at", "y", "person", "org", 1.0),
        ("d1", "a", "born_in", "p", "person", "place", 1.0),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    out = schema_profile(t).collect()
    assert [(r.subj_type, r.pred, r.obj_type) for r in out] == [
        ("person", "works_at", "org"),
        ("person", "born_in", "place"),
    ]
    top = out[0]
    assert top.n_triples == 3 and top.n_subjects == 2 and top.n_objects == 2
    assert top.functionality == 1.5
    assert out[1].functionality == 1.0


# ------------------------------------------------- KG completion (r6b) --
def test_negative_samples_protocol(spark):
    """Each negative is type-consistent, differs from the positive, is
    never a true triple (filtered), and matches the hash-pool brute
    force exactly."""
    from gliner_spark.operators.kg_completion import negative_samples

    rows = [
        ("d0", "a", "likes", "x", "person", "fruit", 1.0),
        ("d0", "a", "likes", "y", "person", "fruit", 1.0),
        ("d1", "b", "likes", "x", "person", "fruit", 1.0),
        ("d1", "b", "visited", "p", "person", "place", 1.0),
        ("d2", "c", "visited", "q", "person", "place", 1.0),
        ("d2", "c", "born_in", "solo", "person", "star", 1.0),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    out = negative_samples(t).collect()
    trues = {(r[1], r[2], r[3]) for r in rows}
    pools = {"fruit": sorted({"x", "y"}), "place": sorted({"p", "q"}),
             "star": ["solo"]}
    # brute force: hash index with wrap-on-collision, filtered
    expect = set()
    for _, s, p, o, _, ot, _ in rows:
        ents = pools[ot]
        idx = _fold(f"{s}|{p}|{o}") % len(ents)
        neg = ents[idx]
        if neg == o:
            neg = ents[(idx + 1) % len(ents)]
        if neg != o and (s, p, neg) not in trues:
            expect.add((s, p, o, neg, ot))
    got = {(r.subj, r.pred, r.pos_obj, r.neg_obj, r.obj_type) for r in out}
    assert got == expect
    # the 1-entity 'star' pool can never produce a negative
    assert all(r.obj_type != "star" for r in out)
    for r in out:
        assert r.neg_obj != r.pos_obj
        assert (r.subj, r.pred, r.neg_obj) not in trues


def test_cooc_candidates_hand_checked(spark):
    """a,b co-occur in 2 docs with no edge between them -> emitted with
    lift N*c(ab)/(c(a)c(b)); the pair that IS an edge is suppressed."""
    from gliner_spark.operators.kg_completion import cooc_candidates

    rows = [
        # doc d0 and d1: a and b co-occur (via separate triples to z)
        ("d0", "a", "r", "z", "t", "t", 1.0),
        ("d0", "b", "r", "z", "t", "t", 1.0),
        ("d1", "a", "r", "z", "t", "t", 1.0),
        ("d1", "b", "r", "z", "t", "t", 1.0),
        # d2: only a
        ("d2", "a", "r", "z", "t", "t", 1.0),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    out = {(r.entity_a, r.entity_b): r for r in cooc_candidates(t).collect()}
    # (a,z) and (b,z) are adjacent (edges) -> suppressed even though
    # they co-occur in >= 2 docs; (a,b) is the non-adjacent candidate
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert (r.n_docs_pair, r.n_docs_a, r.n_docs_b) == (2, 3, 2)
    assert r.lift == round(3 * 2 / (3 * 2), 6)  # N=3 docs


def test_cardinality_constraints_hand_checked(spark):
    from gliner_spark.operators.graph_analytics import cardinality_constraints

    rows = [
        # born_in: functional (each subj one obj), not inverse-functional
        ("a", "born_in", "p"), ("b", "born_in", "p"), ("c", "born_in", "q"),
        # likes: a has 2 objs -> 1/2 functional = 500 permille
        ("a", "likes", "x"), ("a", "likes", "y"), ("b", "likes", "x"),
    ]
    out = {
        r.pred: r
        for r in cardinality_constraints(_triples(spark, rows)).collect()
    }
    b = out["born_in"]
    assert (b.n_subjects, b.n_functional, b.max_objs) == (3, 3, 1)
    assert b.functional_permille == 1000 and bool(b.is_functional)
    assert (b.n_objects, b.n_inv_functional, b.max_subjs) == (2, 1, 2)
    assert b.inverse_permille == 500 and not b.is_inverse_functional
    lk = out["likes"]
    assert (lk.n_subjects, lk.n_functional) == (2, 1)
    assert lk.functional_permille == 500 and not lk.is_functional


def test_entity_provenance_hand_checked(spark):
    from gliner_spark.operators.graph_analytics import entity_provenance

    rows = [
        ("d0", "a", "r1", "b", "t", "t", 1.0),
        ("d1", "a", "r2", "c", "t", "t", 1.0),
        ("d1", "b", "r1", "a", "t", "t", 1.0),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    out = {r.entity: r for r in entity_provenance(t).collect()}
    a = out["a"]
    assert (a.n_docs, a.n_triples, a.n_as_subj, a.n_as_obj) == (2, 3, 2, 1)
    assert (a.n_preds, a.first_doc, a.last_doc) == (2, "d0", "d1")
    assert (out["c"].n_as_subj, out["c"].n_as_obj) == (0, 1)


def test_transe_margin_eval_brute(spark):
    """Energies, margins and per-pred accuracy match a pure-python
    replay of hash_embedding + unclamped L1 over the negative pairs."""
    from gliner_spark.operators.kg_completion import (
        negative_samples,
        transe_margin_eval,
    )

    rows = [
        ("d0", "a", "likes", "x", "person", "fruit", 1.0),
        ("d0", "a", "likes", "y", "person", "fruit", 1.0),
        ("d1", "b", "likes", "x", "person", "fruit", 1.0),
        ("d1", "b", "visited", "p", "person", "place", 1.0),
        ("d2", "c", "visited", "q", "person", "place", 1.0),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )

    def emb(name, dim=8):
        base = _fold(name)
        return [
            ((((base * (j * 2 + 5) + j) % P31) % 256) * 2 - 255) / 256.0
            for j in range(dim)
        ]

    pairs = negative_samples(t).collect()
    assert pairs  # fixture must produce pairs
    stats = {}
    for r in pairs:
        h, rr = emb(r.subj), emb(r.pred)
        tp, tn = emb(r.pos_obj), emb(r.neg_obj)
        e_pos = sum(abs(h[i] + rr[i] - tp[i]) for i in range(8))
        e_neg = sum(abs(h[i] + rr[i] - tn[i]) for i in range(8))
        n, c, m = stats.get(r.pred, (0, 0, 0.0))
        stats[r.pred] = (n + 1, c + (e_pos < e_neg), m + (e_neg - e_pos))
    out = {r.pred: r for r in transe_margin_eval(t).collect()}
    assert set(out) == set(stats)
    for pred, (n, c, msum) in stats.items():
        r = out[pred]
        assert (r.n_pairs, r.n_ranked_correct) == (n, c)
        assert r.accuracy_permille == 1000 * c // n
        # Spark/DuckDB round() is HALF_UP; python round() is banker's —
        # dyadic margins make exact .xxxxxx5 ties constructible, so
        # replay with Decimal HALF_UP.
        from decimal import ROUND_HALF_UP, Decimal

        want = float(
            Decimal(msum / n).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert r.mean_margin == want


def test_metapath_counts_hand_checked(spark):
    from gliner_spark.operators.graph_analytics import metapath_counts

    rows = [
        ("s1", "founded", "o1"), ("s1", "founded", "o2"),
        ("s2", "founded", "o1"),
        ("o1", "based_in", "l1"), ("o1", "based_in", "l2"),
        ("o2", "based_in", "l1"),
        # noise edges on other predicates must not contribute
        ("s1", "visited", "l9"), ("o1", "acquired", "o2"),
    ]
    out = {
        (r.src, r.dst): r.n_paths
        for r in metapath_counts(_triples(spark, rows)).collect()
    }
    # s1: via o1 -> {l1, l2}, via o2 -> {l1}  => l1 x2, l2 x1
    assert out == {
        ("s1", "l1"): 2, ("s1", "l2"): 1,
        ("s2", "l1"): 1, ("s2", "l2"): 1,
    }


# -------------------------------------------------------------- fusion --
def test_fuse_functional_hand_checked(spark):
    """Contested (subj, pred) groups resolve to the max-distinct-doc
    object with lexicographic ties; uncontested groups and media objects
    are excluded."""
    from gliner_spark.operators.kg_fusion import fuse_functional

    rows = [
        # a based_in: x supported by d0,d1; y by d2 -> winner x 2/3
        ("d0", "a", "based_in", "x", "org", "loc"),
        ("d1", "a", "based_in", "x", "org", "loc"),
        ("d1", "a", "based_in", "x", "org", "loc"),  # same doc, no extra vote
        ("d2", "a", "based_in", "y", "org", "loc"),
        # b ceo: tie 1-1 -> lexicographically smaller "p" wins
        ("d0", "b", "ceo", "q", "org", "person"),
        ("d1", "b", "ceo", "p", "org", "person"),
        # c based_in: single object -> not contested, excluded
        ("d0", "c", "based_in", "z", "org", "loc"),
        # media objects never compete
        ("d0", "a", "depicts", "media://1", "org", "media"),
        ("d1", "a", "depicts", "media://2", "org", "media"),
    ]
    df = spark.createDataFrame(
        [(d, s, p, o, st, ot, 1.0) for d, s, p, o, st, ot in rows],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    out = {(r.subj, r.pred): r for r in fuse_functional(df).collect()}
    assert set(out) == {("a", "based_in"), ("b", "ceo")}
    r = out[("a", "based_in")]
    assert (r.obj_fused, r.n_support, r.n_objects, r.total_votes) == (
        "x", 2, 2, 3,
    )
    assert r.confidence_permille == 666
    r = out[("b", "ceo")]
    assert (r.obj_fused, r.n_support, r.confidence_permille) == ("p", 1, 500)


def test_fact_rank_brute(spark):
    """Ranks match a pure-python replay of votes x floor-div rarity with
    the (score DESC, pred, obj) tie rule."""
    from gliner_spark.operators.kg_fusion import (
        FACT_TOP_M,
        FR_UNIT,
        fact_rank,
    )

    rows = [
        ("d0", "a", "likes", "x"), ("d1", "a", "likes", "x"),
        ("d0", "a", "likes", "y"),
        ("d0", "a", "founded", "o"),
        ("d0", "a", "visited", "p"), ("d1", "a", "visited", "q"),
        ("d0", "b", "likes", "x"), ("d1", "b", "founded", "o2"),
    ]
    df = spark.createDataFrame(
        [(d, s, p, o, "t", "t", 1.0) for d, s, p, o in rows],
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    votes = {}
    for d, s, p, o in rows:
        votes.setdefault((s, p, o), set()).add(d)
    pf = {}
    for (s, p, o) in votes:
        pf[p] = pf.get(p, 0) + 1
    scored = [
        (s, p, o, len(ds), len(ds) * (FR_UNIT // pf[p]))
        for (s, p, o), ds in votes.items()
    ]
    want = {}
    for s in {t[0] for t in scored}:
        mine = sorted(
            (t for t in scored if t[0] == s),
            key=lambda t: (-t[4], t[1], t[2]),
        )[:FACT_TOP_M]
        for rk, t in enumerate(mine, start=1):
            want[(s, rk)] = t
    out = {(r.entity, r.rank): r for r in fact_rank(df).collect()}
    assert set(out) == set(want)
    for key, (s, p, o, ns, sc) in want.items():
        r = out[key]
        assert (r.pred, r.obj, r.n_support, r.fact_score) == (p, o, ns, sc)


def test_distmult_margin_eval_brute(spark):
    """DistMult variant: higher diagonal-bilinear score must win, margin
    is the positive advantage s_pos - s_neg."""
    from decimal import ROUND_HALF_UP, Decimal

    from gliner_spark.operators.kg_completion import (
        negative_samples,
        transe_margin_eval,
    )

    rows = [
        ("d0", "a", "likes", "x", "person", "fruit", 1.0),
        ("d0", "a", "likes", "y", "person", "fruit", 1.0),
        ("d1", "b", "likes", "x", "person", "fruit", 1.0),
        ("d1", "b", "visited", "p", "person", "place", 1.0),
        ("d2", "c", "visited", "q", "person", "place", 1.0),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )

    def emb(name, dim=8):
        base = _fold(name)
        return [
            ((((base * (j * 2 + 5) + j) % P31) % 256) * 2 - 255) / 256.0
            for j in range(dim)
        ]

    stats = {}
    for r in negative_samples(t).collect():
        h, rr = emb(r.subj), emb(r.pred)
        tp, tn = emb(r.pos_obj), emb(r.neg_obj)
        s_pos = sum(h[i] * rr[i] * tp[i] for i in range(8))
        s_neg = sum(h[i] * rr[i] * tn[i] for i in range(8))
        n, c, m = stats.get(r.pred, (0, 0, 0.0))
        stats[r.pred] = (n + 1, c + (s_pos > s_neg), m + (s_pos - s_neg))
    out = {
        r.pred: r
        for r in transe_margin_eval(t, scorer="distmult").collect()
    }
    assert set(out) == set(stats)
    for pred, (n, c, msum) in stats.items():
        r = out[pred]
        assert (r.n_pairs, r.n_ranked_correct) == (n, c)
        assert r.accuracy_permille == 1000 * c // n
        want = float(
            Decimal(msum / n).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert r.mean_margin == want


# --------------------------------------------------------------- walks --
def test_walk_corpus_brute(spark):
    """Walks match a pure-python replay of the hash-driven pool walk:
    capped sorted neighbor pools, idx = fold(start|wid|step|cur) % n."""
    from gliner_spark.operators.kg_completion import (
        WALK_LEN,
        WALKS_PER_NODE,
        walk_corpus,
    )

    rng = random.Random(11)
    names = [f"e{i:02d}" for i in range(20)]
    rows = list(
        {
            (rng.choice(names), "r", rng.choice(names))
            for _ in range(40)
        }
    )
    und = sorted(
        {(min(s, o), max(s, o)) for s, _, o in rows if s != o}
    )
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    pools = {n: sorted(v) for n, v in nbrs.items()}  # all degs < cap

    want = {}
    for start in pools:
        for wid in range(WALKS_PER_NODE):
            cur, walk = start, start
            for step in range(1, WALK_LEN):
                p = pools[cur]
                idx = _fold(f"{start}|{wid}|{step}|{cur}") % len(p)
                cur = p[idx]
                walk += "->" + cur
            want[(start, wid)] = walk
    got = {
        (r.entity, r.walk_id): r.walk
        for r in walk_corpus(_triples(spark, rows)).collect()
    }
    assert got == want


def test_walk_corpus_pool_cap(spark):
    """A hub above the cap walks only within its hash-selected pool."""
    from gliner_spark.functions.text import fold_hash as _fh  # noqa: F401
    from gliner_spark.operators.kg_completion import walk_corpus

    rows = [("hub", "r", f"s{i:02d}") for i in range(8)]
    out = walk_corpus(_triples(spark, rows), nbr_cap=3).collect()
    pool = sorted(
        (f"s{i:02d}" for i in range(8)),
        key=lambda s: (_fold(s), s),
    )[:3]
    hub_walks = [r.walk for r in out if r.entity == "hub"]
    assert hub_walks  # hub still walks
    for wk in hub_walks:
        nodes = wk.split("->")
        # every hop FROM the hub lands inside the capped pool
        for a, b in zip(nodes, nodes[1:]):
            if a == "hub":
                assert b in pool


# ------------------------------------------------------------- complex --
def test_complex_margin_eval_brute(spark):
    """ComplEx variant: Re(<h, r, conj(t)>) over real/imag halves must
    win when higher; margin is the positive advantage."""
    from decimal import ROUND_HALF_UP, Decimal

    from gliner_spark.operators.kg_completion import (
        negative_samples,
        transe_margin_eval,
    )

    rows = [
        ("d0", "a", "likes", "x", "person", "fruit", 1.0),
        ("d0", "a", "likes", "y", "person", "fruit", 1.0),
        ("d1", "b", "likes", "x", "person", "fruit", 1.0),
        ("d1", "b", "visited", "p", "person", "place", 1.0),
        ("d2", "c", "visited", "q", "person", "place", 1.0),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )

    def emb(name, dim=8):
        base = _fold(name)
        return [
            ((((base * (j * 2 + 5) + j) % P31) % 256) * 2 - 255) / 256.0
            for j in range(dim)
        ]

    def cx(h, rr, tt, d2=4):
        return sum(
            h[i] * rr[i] * tt[i]
            + h[i] * rr[i + d2] * tt[i + d2]
            + h[i + d2] * rr[i] * tt[i + d2]
            - h[i + d2] * rr[i + d2] * tt[i]
            for i in range(d2)
        )

    stats = {}
    for r in negative_samples(t).collect():
        h, rr = emb(r.subj), emb(r.pred)
        tp, tn = emb(r.pos_obj), emb(r.neg_obj)
        s_pos, s_neg = cx(h, rr, tp), cx(h, rr, tn)
        n, c, m = stats.get(r.pred, (0, 0, 0.0))
        stats[r.pred] = (n + 1, c + (s_pos > s_neg), m + (s_pos - s_neg))
    out = {
        r.pred: r
        for r in transe_margin_eval(t, scorer="complex").collect()
    }
    assert set(out) == set(stats)
    for pred, (n, c, msum) in stats.items():
        r = out[pred]
        assert (r.n_pairs, r.n_ranked_correct) == (n, c)
        assert r.accuracy_permille == 1000 * c // n
        want = float(
            Decimal(msum / n).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert r.mean_margin == want


# -------------------------------------------------------------- rotate --
def test_rotate_margin_eval_brute(spark):
    """RotatE variant: unit-normalized complex rotation + L2 modulus
    distance, lower energy wins; energies quantize to micro-units
    before aggregation so the Spark sums are integer-exact."""
    import math

    from gliner_spark.operators.kg_completion import (
        negative_samples,
        transe_margin_eval,
    )

    rows = [
        ("d0", "a", "likes", "x", "person", "fruit", 1.0),
        ("d0", "a", "likes", "y", "person", "fruit", 1.0),
        ("d1", "b", "likes", "x", "person", "fruit", 1.0),
        ("d1", "b", "visited", "p", "person", "place", 1.0),
        ("d2", "c", "visited", "q", "person", "place", 1.0),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )

    def emb(name, dim=8):
        base = _fold(name)
        return [
            ((((base * (j * 2 + 5) + j) % P31) % 256) * 2 - 255) / 256.0
            for j in range(dim)
        ]

    def energy(h, rr, tt, d2=4):
        e = 0.0
        for i in range(d2):
            mod = math.sqrt(rr[i] * rr[i] + rr[i + d2] * rr[i + d2])
            hr_re = (h[i] * rr[i] - h[i + d2] * rr[i + d2]) / mod
            hr_im = (h[i] * rr[i + d2] + h[i + d2] * rr[i]) / mod
            dre, dim_ = hr_re - tt[i], hr_im - tt[i + d2]
            e += math.sqrt(dre * dre + dim_ * dim_)
        return e

    stats = {}
    for r in negative_samples(t).collect():
        h, rr = emb(r.subj), emb(r.pred)
        # micro-unit quantization, matching the operator's contract
        ep = round(energy(h, rr, emb(r.pos_obj)) * 1_000_000)
        en = round(energy(h, rr, emb(r.neg_obj)) * 1_000_000)
        n, c, m = stats.get(r.pred, (0, 0, 0))
        stats[r.pred] = (n + 1, c + (ep < en), m + (en - ep))
    out = {
        r.pred: r
        for r in transe_margin_eval(t, scorer="rotate").collect()
    }
    assert set(out) == set(stats)
    for pred, (n, c, msum) in stats.items():
        r = out[pred]
        assert (r.n_pairs, r.n_ranked_correct) == (n, c)
        assert r.accuracy_permille == 1000 * c // n
        assert abs(r.mean_margin - msum / n / 1e6) < 1e-6


# --------------------------------------------------------------- rules --
def _rules_brute(edges, min_support):
    """Pure-python AMIE 2-atom miner over distinct (s, p, o) edges."""
    d = sorted({(s, p, o) for s, p, o in edges if s != o})
    n_pred = {}
    for s, p, o in d:
        n_pred[p] = n_pred.get(p, 0) + 1
    pairs = {}
    for s, p, o in d:
        pairs.setdefault((s, o), set()).add(p)
    sup = {}
    for (s, o), preds in pairs.items():
        rev = pairs.get((o, s), set())
        for bp in preds:
            for hp in preds:
                if bp != hp:
                    k = (bp, hp, 0)
                    sup[k] = sup.get(k, 0) + 1
        for bp in rev:
            for hp in preds:
                k = (bp, hp, 1)
                sup[k] = sup.get(k, 0) + 1
    out = {}
    for (bp, hp, inv), s in sup.items():
        if s >= min_support:
            out[(bp, hp, inv)] = (
                s,
                n_pred[bp],
                n_pred[hp],
                1000 * s // n_pred[bp],
                1000 * s // n_pred[hp],
            )
    return out


_RULE_ROWS = [
    # symmetric on 2 of 3 married pairs -> inverse rule conf 800
    ("a", "married_to", "b"), ("b", "married_to", "a"),
    ("c", "married_to", "d"), ("d", "married_to", "c"),
    ("e", "married_to", "f"),
    # ceo_of => works_for on 2 of 3 -> direct rule conf 666
    ("a", "ceo_of", "X"), ("a", "works_for", "X"),
    ("c", "ceo_of", "Y"), ("c", "works_for", "Y"),
    ("e", "ceo_of", "Z"),
]


def test_mine_rules_brute(spark):
    from gliner_spark.operators.kg_completion import mine_rules

    got = {
        (r.body_pred, r.head_pred, r.inverse): (
            r.support, r.n_body, r.n_head, r.conf_permille, r.hc_permille
        )
        for r in mine_rules(_triples(spark, _RULE_ROWS)).collect()
    }
    want = _rules_brute(_RULE_ROWS, 2)
    assert got == want
    # the planted rules surface with the planted confidences
    assert got[("married_to", "married_to", 1)][3] == 800
    assert got[("ceo_of", "works_for", 0)][3] == 666


def test_apply_rules_infers_missing_closure(spark):
    """The two planted >=50%-confidence rules materialize exactly the
    missing counterpart edges, with provenance; known triples are
    never re-emitted."""
    from gliner_spark.operators.kg_completion import apply_rules

    got = [
        (r.subj, r.pred, r.obj, r.rule_body, r.inverse, r.conf_permille)
        for r in apply_rules(_triples(spark, _RULE_ROWS)).collect()
    ]
    existing = {(s, p, o) for s, p, o in _RULE_ROWS}
    for s, p, o, _, _, conf in got:
        assert (s, p, o) not in existing
        assert conf >= 500
    assert ("f", "married_to", "e", "married_to", 1, 800) in got
    assert ("e", "works_for", "Z", "ceo_of", 0, 666) in got
    # works_for => ceo_of (conf 1000) has no missing head edge
    assert not [g for g in got if g[1] == "ceo_of"]
    assert len(got) == 2


# ---------------------------------------------------------------- hits --
def test_hits_brute(spark):
    """Integer HITS matches a pure-python replay of the max-normalized
    mutual-reinforcement rounds; citation star ranks as expected."""
    from gliner_spark.operators.graph_analytics import (
        HITS_ROUNDS,
        HITS_UNIT,
        hits,
    )

    # star: many nodes point at 'pop'; 'hubby' points at everything
    edges = [
        ("a", "pop"), ("b", "pop"), ("c", "pop"),
        ("hubby", "pop"), ("hubby", "a"), ("hubby", "b"), ("pop", "a"),
    ]
    rows = [(s, "cites", o) for s, o in edges]
    nodes = sorted({n for e in edges for n in e})
    hub = {n: HITS_UNIT for n in nodes}
    auth = {}
    for _ in range(HITS_ROUNDS):
        auth = {n: 0 for n in nodes}
        for s, o in set(edges):
            auth[o] += hub[s]
        mx = max(max(auth.values()), 1)
        auth = {n: HITS_UNIT * v // mx for n, v in auth.items()}
        hub = {n: 0 for n in nodes}
        for s, o in set(edges):
            hub[s] += auth[o]
        mx = max(max(hub.values()), 1)
        hub = {n: HITS_UNIT * v // mx for n, v in hub.items()}
    got = {
        r.entity: (r.authority, r.hub)
        for r in hits(_triples(spark, rows)).collect()
    }
    assert got == {n: (auth[n], hub[n]) for n in nodes}
    assert max(got, key=lambda n: got[n][0]) == "pop"
    assert max(got, key=lambda n: got[n][1]) == "hubby"


# --------------------------------------------------------- reciprocity --
def test_reciprocity_hand_checked(spark):
    from gliner_spark.operators.graph_analytics import reciprocity

    rows = [
        ("a", "married_to", "b"), ("b", "married_to", "a"),
        ("c", "married_to", "d"),
        ("a", "ceo_of", "X"), ("c", "ceo_of", "Y"),
        # duplicate mention must not double-count
        ("a", "married_to", "b"),
    ]
    got = {
        r.pred: (r.n_edges, r.n_recip, r.recip_permille)
        for r in reciprocity(_triples(spark, rows)).collect()
    }
    assert got == {
        "married_to": (3, 2, 666),
        "ceo_of": (2, 0, 0),
    }


# ------------------------------------------------------------- squares --
def test_square_counts_brute(spark):
    """Square counts match an independent brute force enumerating every
    4-node cyclic arrangement (K4 yields 3 squares per node)."""
    from itertools import combinations

    from gliner_spark.operators.graph_analytics import square_counts

    # one plain square a-b-c-d, one K4 {p,q,r,s}, a bridge edge
    und = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
        ("p", "q"), ("p", "r"), ("p", "s"),
        ("q", "r"), ("q", "s"), ("r", "s"),
        ("a", "p"),
    ]
    adj = set()
    for x, y in und:
        adj |= {(x, y), (y, x)}
    nodes = sorted({n for e in und for n in e})
    want = {n: 0 for n in nodes}
    for quad in combinations(nodes, 4):
        w, x, y, z = quad
        # 3 distinct cyclic arrangements of 4 nodes
        for cyc in ((w, x, y, z), (w, x, z, y), (w, y, x, z)):
            ok = all(
                (cyc[i], cyc[(i + 1) % 4]) in adj for i in range(4)
            )
            if ok:
                for n in quad:
                    want[n] += 1
    want = {n: c for n, c in want.items() if c}
    rows = [(s, "linked", o) for s, o in und]
    got = {
        r.entity: r.n_squares
        for r in square_counts(_triples(spark, rows)).collect()
    }
    assert got == want
    assert got["p"] == 3  # K4 member: 3 squares
    assert got["a"] == 1  # plain square member: 1


def test_square_counts_pivot_cap_lower_bound(spark):
    """A hub pivot over the cap is excluded: squares THROUGH the hub
    vanish (lower-bound contract), the audit records the drop."""
    from gliner_spark.metrics import skew_metrics
    from gliner_spark.operators.graph_analytics import square_counts

    # square a-hub-b-c-a where hub also fans to many leaves
    und = [("a", "hub"), ("hub", "b"), ("b", "c"), ("c", "a")]
    und += [("hub", f"leaf{i}") for i in range(10)]
    rows = [(s, "linked", o) for s, o in und]
    t = _triples(spark, rows)
    full = {
        r.entity: r.n_squares for r in square_counts(t).collect()
    }
    assert full == {"a": 1, "hub": 1, "b": 1, "c": 1}
    capped_df = square_counts(t, max_fanout=4)
    capped = {r.entity: r.n_squares for r in capped_df.collect()}
    # hub (fan 12) excluded as pivot: the a-hub-b wedge is gone, so
    # diagonal (a, b) loses the square (a and b undercounted to 0);
    # diagonal (hub, c) still closes through the small pivots a and b
    assert capped == {"hub": 1, "c": 1}
    audit = skew_metrics(capped_df)
    assert audit["square_pivot_cap"]["n_dropped_rows"] > 0


# -------------------------------------------------------------- stress --
def test_stress_centrality_brute(spark):
    """Seed-sampled integer stress matches an independent brute force
    that enumerates every shortest path (within depth) and counts
    interior-node occurrences; the barbell bridge is the chokepoint."""
    from gliner_spark.operators.graph_analytics import (
        STRESS_DEPTH,
        stress_centrality,
    )

    # two triangles joined through bridge node 'x'
    und = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("c", "x"), ("x", "d"),
        ("d", "e"), ("e", "f"), ("f", "d"),
    ]
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)

    def bfs_dist(s):
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier and d < STRESS_DEPTH:
            d += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        return dist

    stress = {n: 0 for n in nodes}
    reached = {n: 0 for n in nodes}
    for s in nodes:  # n_seeds >= |V| makes the sample exhaustive
        dist = bfs_dist(s)
        for v in dist:
            if dist[v] > 0:
                reached[v] += 1

        def paths(t):
            if t == s:
                return [[s]]
            return [
                p + [t]
                for u in adj[t]
                if u in dist and dist[u] == dist[t] - 1
                for p in paths(u)
            ]

        for t, dt in dist.items():
            if 0 < dt <= STRESS_DEPTH:
                for p in paths(t):
                    for v in p[1:-1]:
                        stress[v] += 1
    want = {
        n: (stress[n], reached[n]) for n in nodes if reached[n] > 0
    }
    rows = [(u, "linked", v) for u, v in und]
    got = {
        r.entity: (r.stress, r.n_seeds_reached)
        for r in stress_centrality(
            _triples(spark, rows), n_seeds=100
        ).collect()
    }
    assert got == want
    assert max(got, key=lambda n: got[n][0]) in ("x", "c", "d")
    # the bridge carries strictly more traffic than triangle leaves
    assert got["x"][0] > got["a"][0]


# ----------------------------------------------------- incremental CC --
def test_incremental_components_equals_full_recompute(spark):
    """Folding delta edge batches into a running assignment equals the
    full entity_components recompute after EVERY fold — merges across
    old components, brand-new components, and new-entity attachments."""
    from gliner_spark.operators.graph_analytics import (
        entity_components,
        graph_edges,
        incremental_components,
    )

    rng = random.Random(11)
    names = [f"n{i:02d}" for i in range(30)]
    batches = [
        sorted({
            (rng.choice(names), rng.choice(names)) for _ in range(12)
        })
        for _ in range(3)
    ]
    # make batch 2 bridge two earlier components explicitly
    batches[2].append(("n00", "n29"))

    def tri(rows):
        return _triples(spark, [(s, "r", o) for s, o in rows])

    seen = list(batches[0])
    assign = entity_components(tri(seen)).select("entity", "component")
    for delta in batches[1:]:
        assign = incremental_components(
            assign, graph_edges(tri(delta))
        )
        seen += delta
        want = {
            (r.entity, r.component, r.component_size)
            for r in entity_components(tri(seen)).collect()
        }
        got = {
            (r.entity, r.component, r.component_size)
            for r in assign.collect()
        }
        assert got == want
        assign = assign.select("entity", "component")


# ---------------------------------------------------- distance profile --
def test_distance_profile_brute(spark):
    """Per-hop pair counts on a path graph match the closed form, the
    cumulative is monotone, and the last row reaches 1000 permille."""
    from gliner_spark.operators.graph_analytics import (
        HC_DEPTH,
        distance_profile,
    )

    n = 8  # path p0-p1-...-p7
    rows = [(f"p{i}", "next", f"p{i+1}") for i in range(n - 1)]
    # seeds = all nodes (n_seeds >= |V|): pairs at distance d on a path
    # of n nodes = 2 * (n - d), capped at HC_DEPTH
    got = {
        r.dist: (r.n_pairs, r.cum_pairs, r.reached_permille)
        for r in distance_profile(
            _triples(spark, rows), n_seeds=100
        ).collect()
    }
    want_counts = {d: 2 * (n - d) for d in range(1, HC_DEPTH + 1)}
    total = sum(want_counts.values())
    cum = 0
    want = {}
    for d in sorted(want_counts):
        cum += want_counts[d]
        want[d] = (want_counts[d], cum, 1000 * cum // total)
    assert got == want
    assert got[max(got)][2] == 1000


# ------------------------------------------------------- assortativity --
def test_assortativity_brute(spark):
    """Exact edge moments and the coefficient match a pure-python
    Newman r on a star (disassortative) and on a near-regular graph."""
    from gliner_spark.operators.graph_analytics import assortativity

    def brute(und):
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        m = len(und)
        s_jk = sum(deg[a] * deg[b] for a, b in und)
        s_sum = sum(deg[a] + deg[b] for a, b in und)
        s_sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in und)
        den = 2 * m * s_sq - s_sum * s_sum
        r = (
            None if den == 0
            else round((4 * m * s_jk - s_sum * s_sum) / den, 6)
        )
        return m, s_jk, s_sum, s_sq, r

    star = [("hub", f"leaf{i}") for i in range(6)]
    mixed = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    for und in (star, mixed):
        rows = [(u, "r", v) for u, v in und]
        got = assortativity(_triples(spark, rows)).collect()[0]
        m, s_jk, s_sum, s_sq, r = brute(und)
        assert (got.n_edges, got.s_jk, got.s_sum, got.s_sq) == (
            m, s_jk, s_sum, s_sq,
        )
        assert got.assortativity == r
    # a pure star is maximally disassortative
    got = assortativity(
        _triples(spark, [(u, "r", v) for u, v in star])
    ).collect()[0]
    assert got.assortativity == -1.0


# ---------------------------------------------------- pred association --
def test_pred_association_brute(spark):
    from gliner_spark.operators.graph_analytics import pred_association

    rows = [
        # founded + based_in co-occur on 2 of 3 orgs
        ("o1", "founded", "p1"), ("o1", "based_in", "c1"),
        ("o2", "founded", "p2"), ("o2", "based_in", "c2"),
        ("o3", "founded", "p3"),
        ("p1", "visited", "c1"),
        # duplicate mention must not double count
        ("o1", "founded", "p1"),
    ]
    sp = sorted({(s, p) for s, p, _ in rows})
    n_subj = len({s for s, _ in sp})
    freq = {}
    for _, p in sp:
        freq[p] = freq.get(p, 0) + 1
    pair_n = {}
    by_subj = {}
    for s, p in sp:
        by_subj.setdefault(s, []).append(p)
    for s, preds in by_subj.items():
        for i, a in enumerate(sorted(preds)):
            for b in sorted(preds)[i + 1:]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    want = {
        (a, b): (
            n, freq[a], freq[b],
            round(n_subj * n / (freq[a] * freq[b]), 6),
        )
        for (a, b), n in pair_n.items() if n >= 2
    }
    got = {
        (r.pred_a, r.pred_b): (r.n_pair, r.n_a, r.n_b, r.lift)
        for r in pred_association(_triples(spark, rows)).collect()
    }
    assert got == want
    assert got[("based_in", "founded")][0] == 2


# --------------------------------------------------------- triad census --
def test_triad_census_brute(spark):
    """All five collapsed classes planted and recovered exactly."""
    from gliner_spark.operators.graph_analytics import triad_census

    rows = [
        # 030T transitive: a->b, a->c, b->c
        ("ta", "r", "tb"), ("ta", "r", "tc"), ("tb", "r", "tc"),
        # 030C cyclic: ca->cb->cc->ca
        ("ca", "r", "cb"), ("cb", "r", "cc"), ("cc", "r", "ca"),
        # 120: one mutual pair (ma<->mb) + single arcs closing on mc
        ("ma", "r", "mb"), ("mb", "r", "ma"),
        ("ma", "r", "mc"), ("mb", "r", "mc"),
        # 210: two mutual pairs
        ("pa", "r", "pb"), ("pb", "r", "pa"),
        ("pa", "r", "pc"), ("pc", "r", "pa"), ("pb", "r", "pc"),
        # 300: all mutual
        ("xa", "r", "xb"), ("xb", "r", "xa"),
        ("xa", "r", "xc"), ("xc", "r", "xa"),
        ("xb", "r", "xc"), ("xc", "r", "xb"),
    ]
    got = {
        r.triad_type: r.n_triangles
        for r in triad_census(_triples(spark, rows)).collect()
    }
    assert got == {"030T": 1, "030C": 1, "120": 1, "210": 1, "300": 1}


def test_triad_census_brute_random(spark):
    """Census matches an independent per-triangle classification on a
    random directed graph."""
    from itertools import combinations

    from gliner_spark.operators.graph_analytics import triad_census

    rng = random.Random(5)
    names = [f"v{i}" for i in range(12)]
    edges = sorted({
        (rng.choice(names), rng.choice(names)) for _ in range(40)
    })
    edges = [(s, o) for s, o in edges if s != o]
    eset = set(edges)
    und = {tuple(sorted(e)) for e in edges}
    want = {}
    for a, x, y in combinations(sorted(names), 3):
        if {(a, x) if a < x else (x, a),
            tuple(sorted((a, y))),
            tuple(sorted((x, y)))} <= und:
            def flag(lo, hi):
                return ((lo, hi) in eset) + 2 * ((hi, lo) in eset)
            f1, f2, f3 = flag(a, x), flag(a, y), flag(x, y)
            nr = sum(f == 3 for f in (f1, f2, f3))
            if nr == 3:
                t = "300"
            elif nr == 2:
                t = "210"
            elif nr == 1:
                t = "120"
            elif (f1, f3, f2) in ((1, 1, 2), (2, 2, 1)):
                t = "030C"
            else:
                t = "030T"
            want[t] = want.get(t, 0) + 1
    got = {
        r.triad_type: r.n_triangles
        for r in triad_census(
            _triples(spark, [(s, "r", o) for s, o in edges])
        ).collect()
    }
    assert got == want


# ---------------------------------------------------- weighted pagerank --
def test_pagerank_weighted_brute(spark):
    """Weighted ranks match a pure-python bigint replay; a heavily
    multi-doc-supported edge out-pulls a singleton edge."""
    from gliner_spark.operators.graph_analytics import (
        PR_DAMP,
        PR_UNIT,
        WPR_ITERS,
        pagerank_weighted,
    )

    rows = [
        ("d0", "s", "r", "heavy", "t", "t", 1.0),
        ("d1", "s", "r", "heavy", "t", "t", 1.0),
        ("d2", "s", "r", "heavy", "t", "t", 1.0),
        ("d3", "s", "r", "light", "t", "t", 1.0),
        ("d0", "heavy", "r", "s", "t", "t", 1.0),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string, "
        "subj_type string, obj_type string, score double",
    )
    w = {("s", "heavy"): 3, ("s", "light"): 1, ("heavy", "s"): 1}
    nodes = {"s", "heavy", "light"}
    ow = {}
    for (a, _), ww in w.items():
        ow[a] = ow.get(a, 0) + ww
    base = PR_UNIT * (1000 - PR_DAMP) // 1000
    rank = {n: PR_UNIT for n in nodes}
    for _ in range(WPR_ITERS):
        s = {n: 0 for n in nodes}
        for (a, b), ww in w.items():
            s[b] += rank[a] * ww // ow[a]
        rank = {n: base + PR_DAMP * s[n] // 1000 for n in nodes}
    got = {
        r.node: r.rank for r in pagerank_weighted(t).collect()
    }
    assert got == rank
    assert got["heavy"] > got["light"]


# ----------------------------------------------------------- containment --
def test_containment_pairs_brute(spark):
    """Exact containment permilles match a pure-python replay (winnow
    candidates -> distinct-gram intersection), and a quoted doc is
    flagged as near-contained even though its Jaccard is low."""
    from gliner_spark.operators.dedup import (
        CONTAIN_MIN_PERMILLE,
        WINNOW_MIN_SHARED,
        containment_pairs,
    )
    from gliner_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_POS_BITS,
        WINNOW_W,
    )

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        ("d_long", "intro words here " + quote + " closing remarks "
                   "and much more unrelated text follows now ok"),
        ("d_short", quote),
        ("d_other", "totally different content with no overlap at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")

    def grams(text):
        toks = text.split(" ")
        ids = [_fold(t) for t in toks]
        out = []
        for i in range(len(ids) - WINNOW_K + 1):
            g = 0
            for x in ids[i:i + WINNOW_K]:
                g = (g * 131 + x) % P31
            out.append(g)
        return out

    fps = {
        d: {f for _, f in _winnow_brute(
            t.split(" "), WINNOW_K, WINNOW_W, WINNOW_POS_BITS
        )}
        for d, t in docs
    }
    gsets = {d: set(grams(t)) for d, t in docs}
    want = {}
    names = sorted(fps)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if len(fps[a] & fps[b]) >= WINNOW_MIN_SHARED:
                sh = len(gsets[a] & gsets[b])
                ca = 1000 * sh // len(gsets[a])
                cb = 1000 * sh // len(gsets[b])
                if max(ca, cb) >= CONTAIN_MIN_PERMILLE:
                    want[(a, b)] = (
                        sh, len(gsets[a]), len(gsets[b]), ca, cb
                    )
    got = {
        (r.doc_a, r.doc_b): (
            r.n_shared_grams, r.n_grams_a, r.n_grams_b,
            r.contain_a_permille, r.contain_b_permille,
        )
        for r in containment_pairs(df).collect()
    }
    assert got == want
    # the quoted short doc is near-fully contained in the long one
    key = ("d_long", "d_short")
    assert key in got
    assert got[key][4] == 1000  # every short-doc gram appears in d_long
    assert got[key][3] < 500    # ...but the long doc is NOT contained
