from modegpt_tpu.calib.data import load_calibration_batches, load_eval_tokens
from modegpt_tpu.calib.engine import CalibrationResult, calibrate

__all__ = [
    "load_calibration_batches",
    "load_eval_tokens",
    "CalibrationResult",
    "calibrate",
]
