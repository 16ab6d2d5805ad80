"""Adjacency-layer variants (reference relations_layers.py:45-406): shape /
range / attention-row-stochastic contracts, plus pair-pruning integration
with the relation pass."""

import dataclasses

import numpy as np
import pytest

from gliner_spark.core.adjacency import (
    ADJACENCY_MODES,
    adjacency,
    adjacency_weights,
)
from gliner_spark.presets import default_model
from gliner_spark.sources.synth import assembled_text, gen_doc

E, D = 6, 32
X = np.random.default_rng(11).normal(size=(E, D))


@pytest.mark.parametrize("mode", ADJACENCY_MODES)
def test_shapes_and_range(mode):
    w = adjacency_weights(mode, D, seed=4)
    a = adjacency(mode, X, w)
    assert a.shape == (E, E)
    assert ((a >= 0) & (a <= 1)).all()
    # deterministic
    assert np.array_equal(a, adjacency(mode, X, w))


def test_attention_rows_stochastic():
    w = adjacency_weights("attn", D, seed=4)
    a = adjacency("attn", X, w)
    assert a.sum(axis=1) == pytest.approx(np.ones(E))


def test_dot_and_bilinear_symmetric():
    assert np.allclose(adjacency("dot", X, {}), adjacency("dot", X, {}).T)
    w = adjacency_weights("bilinear", D, seed=4)
    a = adjacency("bilinear", X, w)
    assert np.allclose(a, a.T)


@pytest.mark.parametrize("mode", ["mlp", "bilinear", "attn", "gcn", "gat"])
def test_model_pair_pruning_subset_of_all_pairs(mode):
    base = default_model()
    m_all = base
    m_adj = dataclasses.replace(
        base, config=dataclasses.replace(base.config, adjacency_mode=mode)
    )
    m_none = dataclasses.replace(
        base,
        config=dataclasses.replace(
            base.config, adjacency_mode=mode, adjacency_threshold=-1.0
        ),
    )
    subset_seen = False
    for i in range(40):
        text = assembled_text(gen_doc(i)["spans"])
        mentions, tokens, _, _ = m_all.predict_doc(text)
        rel_all = {
            (r["head_idx"], r["tail_idx"], r["relation"])
            for r in m_all.predict_relations_doc(tokens, mentions)
        }
        rel_adj = {
            (r["head_idx"], r["tail_idx"], r["relation"])
            for r in m_adj.predict_relations_doc(tokens, mentions)
        }
        rel_none = {
            (r["head_idx"], r["tail_idx"], r["relation"])
            for r in m_none.predict_relations_doc(tokens, mentions)
        }
        assert rel_adj <= rel_all            # pruning only removes pairs
        assert rel_none == rel_all           # threshold < 0 keeps everything
        subset_seen = subset_seen or rel_all
    assert subset_seen  # corpus actually produced relations
