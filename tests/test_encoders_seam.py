"""Encoder seam: SpanEncoder (backend-agnostic adapter) must be
bit-identical to the oracle-gated dense path when given the same word
vectors — proving the only untested line on the real-encoder path is the
import-gated HF backend construction itself."""

import numpy as np
import pytest

from gliner_spark.core.dense import (
    mean_pool_labels,
    random_quantized,
    score_doc_dense,
)
from gliner_spark.core.encoders import DenseCheckpointBackend, SpanEncoder
from gliner_spark.sources.synth import assembled_text, gen_doc

LABELS = ["person", "organization", "location", "date"]


def _enc():
    ck = random_quantized(LABELS)
    return ck, SpanEncoder(DenseCheckpointBackend(ck))


def test_encode_labels_matches_dense_mean_pooling():
    ck, enc = _enc()
    got = enc.encode_labels(LABELS)
    assert np.array_equal(got, mean_pool_labels(LABELS, ck.emb))
    assert np.array_equal(got, ck.label_matrix)


def test_score_text_matches_gated_dense_path_bit_exact():
    ck, enc = _enc()
    for i in range(25):
        text = assembled_text(gen_doc(i)["spans"])
        si_a, v_a, p_a = enc.score_text(
            text, ck.marker(), ck.label_matrix, ck.scale, ck.bias,
            ck.max_width,
        )
        si_b, v_b, p_b = score_doc_dense(text, ck)
        assert np.array_equal(si_a, si_b)
        assert np.array_equal(v_a, v_b)
        assert np.array_equal(p_a, p_b)  # bit-exact float64


def test_empty_text_contract():
    ck, enc = _enc()
    si, v, p = enc.score_text(
        "", ck.marker(), ck.label_matrix, ck.scale, ck.bias, ck.max_width
    )
    assert si.shape == (0, 2) and v.shape == (0,) and p.shape == (0, 4)


def test_hf_backend_is_import_gated():
    from gliner_spark.core.encoders import HFTransformerBackend

    with pytest.raises(ImportError, match="torch"):
        HFTransformerBackend("any/model")


def test_extract_spans_encoder_equals_dense_on_spark(spark, tmp_path):
    """The distributed SpanEncoder route (SparkFiles npz -> backend ->
    protocol scoring inside mapInPandas) must emit the exact rows of the
    oracle-gated extract_spans_dense broadcast route — the end-to-end
    proof that swapping the encoder backend touches zero Spark code."""
    from pyspark.sql import functions as F

    from gliner_spark.operators.extraction import (
        extract_spans_dense,
        extract_spans_encoder,
    )

    ckpt = random_quantized(["person", "organization", "location", "date"])
    p = str(tmp_path / "seam_ckpt.npz")
    ckpt.save_npz(p)
    docs = spark.createDataFrame(
        [(f"d{i:03d}", assembled_text(gen_doc(i)["spans"])) for i in range(40)],
        "doc_id string, text string",
    ).select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    a = sorted(map(tuple, extract_spans_dense(docs, ckpt).collect()))
    b = sorted(map(tuple, extract_spans_encoder(docs, p).collect()))
    assert a == b and len(a) > 0
