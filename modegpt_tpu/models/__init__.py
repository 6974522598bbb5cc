from modegpt_tpu.models.spec import ModelSpec, spec_from_hf_config
from modegpt_tpu.models.forward import forward, CalibStats
from modegpt_tpu.models.hf import params_from_hf_model, load_hf_model

__all__ = [
    "ModelSpec",
    "spec_from_hf_config",
    "forward",
    "CalibStats",
    "params_from_hf_model",
    "load_hf_model",
]
