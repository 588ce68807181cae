from pinnfc_tpu.training.stages import (
    StageResult,
    TrainLog,
    train_dnn_stage,
    train_dnn_chunk,
    train_lambda_v_stage,
    train_lambda_v_chunk,
    train_residual_stage,
    train_residual_chunk,
    run_schedule,
)

__all__ = [
    "StageResult",
    "TrainLog",
    "train_dnn_stage",
    "train_dnn_chunk",
    "train_lambda_v_stage",
    "train_lambda_v_chunk",
    "train_residual_stage",
    "train_residual_chunk",
    "run_schedule",
]
