"""Span-representation mode library (reference span_rep.py:686-759 factory):
shape contract + exact hand math for the parameter-free cores."""

import numpy as np
import pytest

from gliner_spark.core.heads import MarkerV0Weights, span_marker_v0
from gliner_spark.core.span_reps import (
    SPAN_MODES,
    random_span_rep_weights,
    span_rep,
)
from gliner_spark.core.spans import enumerate_spans

L, D, K = 7, 16, 4
RNG = np.random.default_rng(3)
H = RNG.normal(size=(L, D))
SPAN_IDX, VALID = enumerate_spans(L, K)


@pytest.mark.parametrize("mode", SPAN_MODES)
def test_all_modes_shape_and_determinism(mode):
    w = random_span_rep_weights(mode, D, K, seed=5)
    a = span_rep(mode, H, SPAN_IDX, K, w)
    b = span_rep(mode, H, SPAN_IDX, K, w)
    assert a.shape == (L * K, D)
    assert np.array_equal(a, b)
    assert np.isfinite(a).all()


def test_markerV0_matches_heads_port():
    w = random_span_rep_weights("markerV0", D, K, seed=5)
    got = span_rep("markerV0", H, SPAN_IDX, K, w)
    want = span_marker_v0(
        H, SPAN_IDX,
        MarkerV0Weights(w["w_start"], w["w_end"], w["w_out"], w["b_out"]),
    )
    assert np.array_equal(got, want)


def test_conv_pool_cores_hand_math():
    """conv_mean/sum/max over right-zero-padded windows, per the reference's
    pad-then-pool order (span_rep.py:196-216)."""
    w = {"w": np.eye(D), "b": np.zeros(D)}
    for mode in ("conv_mean", "conv_sum", "conv_max"):
        out = span_rep(mode, H, SPAN_IDX, K, w).reshape(L, K, D)
        for l in range(L):
            for k in range(K):
                win = np.zeros((k + 1, D))
                n_real = min(k + 1, L - l)
                win[:n_real] = H[l : l + n_real]
                if mode == "conv_max":
                    want = win.max(axis=0)
                elif mode == "conv_mean":
                    want = win.mean(axis=0)
                else:
                    want = win.mean(axis=0) * (k + 1)
                # identity projection: grid = relu(stack) @ I
                assert out[l, k] == pytest.approx(np.maximum(want, 0.0)), (mode, l, k)


def test_query_mode_einsum_semantics():
    """query: rep[l, s] = relu(Linear(h[l] * q[:, s])) — einsum bld,ds->blsd
    (span_rep.py:40-55)."""
    w = random_span_rep_weights("query", D, K, seed=9)
    out = span_rep("query", H, SPAN_IDX, K, w).reshape(L, K, D)
    l, s = 2, 3
    want = np.maximum((H[l] * w["q"][:, s]) @ w["w"] + w["b"], 0.0)
    assert out[l, s] == pytest.approx(want)


def test_markerV1_uses_mean_token():
    """markerV1 augments each span with the projected MEAN token embedding
    (span_rep.py:548-585) — shifting one token shifts every span's rep."""
    w = random_span_rep_weights("markerV1", D, K, seed=1)
    a = span_rep("markerV1", H, SPAN_IDX, K, w)
    h2 = H.copy()
    h2[-1] += 10.0  # changes the mean -> every span rep must move
    b = span_rep("markerV1", h2, SPAN_IDX, K, w)
    # spans not touching the last token still change (mean-token channel)
    assert not np.allclose(a[0], b[0])


def test_scoring_seam_any_mode():
    """Every mode drops into the matmul score head unchanged."""
    labels = RNG.normal(size=(5, D))
    for mode in SPAN_MODES:
        w = random_span_rep_weights(mode, D, K, seed=2)
        rep = span_rep(mode, H, SPAN_IDX, K, w)
        probs = 1.0 / (1.0 + np.exp(-(rep @ labels.T)))
        assert probs.shape == (L * K, 5)
