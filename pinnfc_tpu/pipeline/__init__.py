from pinnfc_tpu.pipeline.export import build_comprehensive_results
from pinnfc_tpu.pipeline.score import ScoreResult, run_scoring_pipeline
from pinnfc_tpu.pipeline.train_pipeline import (
    PipelineResult,
    evaluate_voltage_metrics,
    run_training_pipeline,
)

__all__ = [
    "build_comprehensive_results",
    "PipelineResult",
    "evaluate_voltage_metrics",
    "run_training_pipeline",
    "ScoreResult",
    "run_scoring_pipeline",
]
