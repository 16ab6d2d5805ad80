"""Default model preset: the synthesis vocabulary as the model's frozen
'weights' (the analog of a trained GLiNER checkpoint for this corpus)."""

from __future__ import annotations

from gliner_spark.config import PipelineConfig
from gliner_spark.core.model import GlinerSparkModel
from gliner_spark.sources import vocab


def default_model(config: PipelineConfig | None = None) -> GlinerSparkModel:
    cfg = config or PipelineConfig(dim=2048, score_scale=24.0, score_bias=0.9)
    return GlinerSparkModel.from_gazetteer(
        gazetteer=vocab.GAZETTEER,
        relation_patterns=vocab.REL_PHRASES,
        config=cfg,
    )
