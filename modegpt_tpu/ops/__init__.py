from modegpt_tpu.ops.psd import sqrt_psd, sqrt_and_inv_sqrt_psd, ridge_inverse_diag
from modegpt_tpu.ops.allocation import allocate_keep_ratios
from modegpt_tpu.ops.mlp import nystrom_mlp, nystrom_scores, nystrom_select
from modegpt_tpu.ops.qk import (
    qk_rope_pair_scores,
    qk_opt_scores,
    compress_qk_layer_rope,
    compress_qk_layer_opt,
    compress_qk_layer_svd,
)
from modegpt_tpu.ops.vo import compress_vo_layer

__all__ = [
    "sqrt_psd",
    "sqrt_and_inv_sqrt_psd",
    "ridge_inverse_diag",
    "allocate_keep_ratios",
    "nystrom_mlp",
    "nystrom_scores",
    "nystrom_select",
    "qk_rope_pair_scores",
    "qk_opt_scores",
    "compress_qk_layer_rope",
    "compress_qk_layer_opt",
    "compress_qk_layer_svd",
    "compress_vo_layer",
]
