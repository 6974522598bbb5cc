from modegpt_tpu.compress.surgery import apply_factors, compress_ranks_for_layer
from modegpt_tpu.compress.artifact import (
    save_layer_factors,
    load_layer_factors,
    save_compressed_model,
    load_compressed_model,
)
from modegpt_tpu.compress.pipeline import run_compression

__all__ = [
    "apply_factors",
    "compress_ranks_for_layer",
    "save_layer_factors",
    "load_layer_factors",
    "save_compressed_model",
    "load_compressed_model",
    "run_compression",
]
