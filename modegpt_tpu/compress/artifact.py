"""Compressed-model persistence: per-layer factor store + final artifact.

Mirrors the reference's two-tier persistence design (SURVEY.md §5
checkpoint/resume):

* per-layer factor checkpointing to a temp dir, decoupling the solvers
  from surgery and enabling resume (reference:
  model_adapter.py:184-191 `save_layer` writing ``layer_{i}_{suffix}``
  torch.save files, consumed by `convert_model` :193-237);
* a final self-describing artifact directory (reference:
  model_utils.py:83-126 `save_compressed_model` = HF save_pretrained +
  rotary_masks.pt + copied Rebuild .py + tokenizer_source.txt).

TPU-native redesign: the artifact is a ``spec.json`` (the ModelSpec —
per-layer ranks ARE the architecture, no modeling code is shipped) plus
a flat ``params.npz`` of the pytree leaves (rotary masks are ordinary
leaves). float32/bfloat16 storage is recorded in the sidecar; bfloat16
round-trips through a uint16 bit view since npz has no native bf16.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modegpt_tpu.models.spec import ModelSpec

__all__ = [
    "save_layer_factors",
    "load_layer_factors",
    "save_compressed_model",
    "load_compressed_model",
]

_FORMAT_VERSION = 1


def _factor_path(output_dir: str, layer_idx: int, suffix: str) -> str:
    # Same naming scheme as the reference's temp store for familiarity.
    return os.path.join(os.path.expandvars(output_dir), f"layer_{layer_idx}_{suffix}.npz")


def save_layer_factors(output_dir: str, layer_idx: int, suffix: str, factors: Dict) -> str:
    """Persist one layer's solver factors (suffix in mlp|qk|vo)."""
    os.makedirs(os.path.expandvars(output_dir), exist_ok=True)
    path = _factor_path(output_dir, layer_idx, suffix)
    arrays = {}
    for k, v in factors.items():
        if v is None:
            continue
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            a = a.astype(np.float32)  # npz has no bf16; f32 is lossless here
        arrays[k] = a
    np.savez(path, **arrays)
    return path


def load_layer_factors(output_dir: str, layer_idx: int, suffix: str) -> Optional[Dict]:
    """Load one layer's factors, or None if not yet solved (resume support)."""
    path = _factor_path(output_dir, layer_idx, suffix)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        out[prefix[:-1] + "::none"] = np.zeros(0)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _store_array(a: np.ndarray) -> Tuple[np.ndarray, str]:
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


def _is_weight_key(key: str) -> bool:
    """Leaves worth quantizing: projection kernels and the (un)embedding.
    Norm scales, biases and rotary masks stay full precision (tiny)."""
    leaf = key.rsplit("/", 1)[-1]
    return leaf == "kernel" or leaf in ("embed_tokens", "embed_positions")


def _quantize_int8(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8: the max-abs reduction runs over
    the IN axis only (axis -2 of [..., in, out] kernels), so stacked
    expert kernels [E, in, out] keep per-(expert, channel) scales —
    matching models/quantize.quantize_linear. Stored with keepdims so
    ``codes * scale`` broadcasts at any rank; 1-D vectors scale whole.
    Weight-only quantization — dequantized to the compute dtype at load."""
    af = np.asarray(a, dtype=np.float32)
    axis = -2 if af.ndim >= 2 else 0
    amax = np.max(np.abs(af), axis=axis, keepdims=True)
    scale = (amax / 127.0).astype(np.float32)
    scale = np.where(scale == 0.0, 1.0, scale)
    q = np.clip(np.rint(af / scale), -127, 127).astype(np.int8)
    return q, scale


def _pack_nibbles(codes: np.ndarray) -> np.ndarray:
    """Flatten unsigned 4-bit codes [0, 15] and pack two per byte."""
    flat = codes.reshape(-1).astype(np.uint8)
    if flat.size % 2:
        flat = np.concatenate([flat, np.zeros(1, np.uint8)])
    return (flat[0::2] | (flat[1::2] << 4)).astype(np.uint8)


def _unpack_nibbles(packed: np.ndarray, size: int) -> np.ndarray:
    lo = packed & 0x0F
    hi = packed >> 4
    flat = np.empty(packed.size * 2, np.uint8)
    flat[0::2] = lo
    flat[1::2] = hi
    return flat[:size]


def _quantize_int4(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray, Tuple[int, ...]]:
    """Symmetric per-output-channel int4 in [-7, 7], packed two codes per
    byte (scale axes as `_quantize_int8`). ~8x smaller than f32;
    dequantized (or kept int4-resident) at load."""
    af = np.asarray(a, dtype=np.float32)
    axis = -2 if af.ndim >= 2 else 0
    amax = np.max(np.abs(af), axis=axis, keepdims=True)
    scale = (amax / 7.0).astype(np.float32)
    scale = np.where(scale == 0.0, 1.0, scale)
    q = np.clip(np.rint(af / scale), -7, 7).astype(np.int8)
    return _pack_nibbles((q + 8).astype(np.uint8)), scale, af.shape


# The QLoRA NF4 codebook: 16 quantiles of a standard normal, normalised
# to [-1, 1] (Dettmers et al., 2023 "QLoRA", Appendix E) — information-
# theoretically optimal for normally-distributed weights.
_NF4_CODE = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    dtype=np.float32,
)
_NF4_BLOCK = 64


def _quantize_nf4(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray, Tuple[int, ...]]:
    """Blockwise NF4: absmax-scale each 64-value block to [-1, 1], map to
    the nearest NF4 quantile, pack two codes per byte (QLoRA storage
    scheme). Always dequantized at load (the codebook lookup has no
    matmul-resident form)."""
    af = np.asarray(a, dtype=np.float32)
    flat = af.reshape(-1)
    pad = (-flat.size) % _NF4_BLOCK
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    blocks = flat.reshape(-1, _NF4_BLOCK)
    absmax = np.max(np.abs(blocks), axis=1, keepdims=True)
    absmax = np.where(absmax == 0.0, 1.0, absmax)
    normed = blocks / absmax
    codes = np.argmin(np.abs(normed[..., None] - _NF4_CODE), axis=-1).astype(np.uint8)
    return _pack_nibbles(codes), absmax.reshape(-1).astype(np.float32), af.shape


def _dequantize_nf4(packed: np.ndarray, scale: np.ndarray, shape) -> np.ndarray:
    size = int(np.prod(shape))
    padded = scale.size * _NF4_BLOCK
    codes = _unpack_nibbles(packed, padded)
    vals = _NF4_CODE[codes].reshape(-1, _NF4_BLOCK) * scale[:, None]
    return vals.reshape(-1)[:size].reshape(shape).astype(np.float32)


def save_compressed_model(
    save_dir: str,
    spec: ModelSpec,
    params: Dict,
    tokenizer_source: str = "",
    metadata: Optional[Dict] = None,
    dtype: str = "float32",
    backend: str = "npz",
) -> str:
    """Write the final artifact: spec.json + params.npz + tokenizer_source.txt.

    dtype: "float32" | "bfloat16" | "int8" | "int4" | "nf4". The
    quantized dtypes store projection kernels and embeddings weight-only
    with float32 scale sidecar leaves, everything else float32:
    int8 = symmetric per-out-channel (~4x smaller than f32);
    int4 = symmetric per-out-channel in [-7, 7], two codes per byte
    (~8x); nf4 = blockwise (64) absmax + the QLoRA normal-float
    codebook (~8x, better tails than int4 for normal-ish weights).

    backend: "npz" (single-file, default) or "orbax" — Orbax's
    OCDBT/tensorstore format supports async multi-host writes and
    sharded restore for artifacts beyond one host's RAM (SURVEY.md §5
    checkpoint/resume: "Orbax/safetensors per-layer factor store").
    """
    os.makedirs(save_dir, exist_ok=True)

    if backend == "orbax":
        if dtype in ("int8", "int4", "nf4"):
            raise ValueError(f"{dtype} quantization is supported by the npz backend only")
        import orbax.checkpoint as ocp

        target = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        cast = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).astype(target)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else jnp.asarray(a),
            params,
        )
        ckpt_dir = os.path.abspath(os.path.join(save_dir, "params_orbax"))
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(ckpt_dir, cast, force=True)
        sidecar = {
            "format_version": _FORMAT_VERSION,
            "spec": spec.to_dict(),
            "dtypes": {},
            "storage_dtype": dtype,
            "backend": "orbax",
            "metadata": metadata or {},
        }
        with open(os.path.join(save_dir, "spec.json"), "w") as f:
            json.dump(sidecar, f, indent=2)
        with open(os.path.join(save_dir, "tokenizer_source.txt"), "w") as f:
            f.write(tokenizer_source.strip())
        return save_dir

    flat = _flatten(jax.device_get(params))
    target = jnp.bfloat16 if dtype == "bfloat16" else np.float32
    stored, dtypes = {}, {}
    for k, v in flat.items():
        is_float = np.issubdtype(v.dtype, np.floating) or v.dtype == jnp.bfloat16
        if is_float and dtype in ("int8", "int4", "nf4") and _is_weight_key(k):
            vf = np.asarray(jnp.asarray(v).astype(np.float32))
            if dtype == "int8":
                q, scale = _quantize_int8(vf)
            elif dtype == "int4":
                q, scale, shape = _quantize_int4(vf)
                stored[k + "::shape"] = np.asarray(shape, np.int64)
                dtypes[k + "::shape"] = "int64"
            else:
                q, scale, shape = _quantize_nf4(vf)
                stored[k + "::shape"] = np.asarray(shape, np.int64)
                dtypes[k + "::shape"] = "int64"
            stored[k] = q
            stored[k + "::scale"] = scale
            dtypes[k] = dtype
            dtypes[k + "::scale"] = "float32"
            continue
        if is_float:
            v = np.asarray(jnp.asarray(v).astype(target)) if dtype == "bfloat16" else v.astype(
                np.float32
            )
        a, dt = _store_array(v)
        # '/' is fine inside npz names; keep keys as-is.
        stored[k] = a
        dtypes[k] = dt
    np.savez(os.path.join(save_dir, "params.npz"), **stored)

    sidecar = {
        "format_version": _FORMAT_VERSION,
        "spec": spec.to_dict(),
        "dtypes": dtypes,
        "storage_dtype": dtype,
        "metadata": metadata or {},
    }
    with open(os.path.join(save_dir, "spec.json"), "w") as f:
        json.dump(sidecar, f, indent=2)

    # Tokenizer source pointer (reference: model_utils.py:123-124).
    with open(os.path.join(save_dir, "tokenizer_source.txt"), "w") as f:
        f.write(tokenizer_source.strip())
    return save_dir


def _unflatten(flat: Dict[str, np.ndarray], n_layers: int) -> Dict:
    tree: Dict = {}
    for key, val in flat.items():
        if key.endswith("::none"):
            key, val = key[: -len("::none")], None
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    # convert the integer-keyed "layers" dict into a list
    if "layers" in tree:
        layers = tree["layers"]
        tree["layers"] = [layers[str(i)] for i in range(n_layers)]
    return tree


def load_compressed_model(save_dir: str, resident_int8: bool = False):
    """Load (spec, params, tokenizer_source) from an artifact directory.

    Fail-fast shape validation at load (replaces the reference's
    parameter-load crash monkeypatch, run_modegpt.py:46-68): every leaf's
    shape is re-derivable from the spec; mismatches raise with the
    parameter name.

    resident_int8: for int8/int4 artifacts, keep projection kernels
    quantized as ``kernel_q`` + ``scale`` leaves (int8, or native jax
    int4) instead of dequantizing — the forward consumes them directly
    (models/quantize.py), cutting weight HBM traffic 2x/4x vs bf16.
    Embeddings always dequantize (they are gathers); nf4 always
    dequantizes (codebook lookup has no matmul-resident form).
    """
    with open(os.path.join(save_dir, "spec.json")) as f:
        sidecar = json.load(f)
    if sidecar["format_version"] > _FORMAT_VERSION:
        raise ValueError(f"artifact written by a newer format: {sidecar['format_version']}")
    spec = ModelSpec.from_dict(sidecar["spec"])

    if sidecar.get("backend") == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            params = ckptr.restore(os.path.abspath(os.path.join(save_dir, "params_orbax")))
        if "lm_head" not in params:
            params["lm_head"] = None
        if isinstance(params.get("layers"), dict):
            params["layers"] = [params["layers"][str(i)] for i in range(spec.n_layers)]
        _validate_shapes(spec, params)
        return spec, params, _read_tokenizer_source(save_dir)

    flat = {}
    with np.load(os.path.join(save_dir, "params.npz")) as z:
        raw = {k: z[k] for k in z.files}
    for k, a in raw.items():
        if k.endswith("::scale") or k.endswith("::shape"):
            continue
        kdt = sidecar["dtypes"].get(k)

        def resident_scale(s):
            # stored keepdims ([..., 1, out]) -> the forward's expected
            # shape ([out] for 2-D kernels, [E, out] for expert stacks);
            # flat [out] scales from older artifacts pass through.
            return np.squeeze(s, axis=-2) if s.ndim >= 2 else s

        if kdt == "int8":
            if resident_int8 and k.rsplit("/", 1)[-1] == "kernel":
                flat[k[: -len("kernel")] + "kernel_q"] = a
                flat[k[: -len("kernel")] + "scale"] = resident_scale(raw[k + "::scale"])
                continue
            a = (a.astype(np.float32) * raw[k + "::scale"]).astype(np.float32)
        elif kdt == "int4":
            shape = tuple(int(s) for s in raw[k + "::shape"])
            codes = _unpack_nibbles(a, int(np.prod(shape))).astype(np.int8) - 8
            codes = codes.reshape(shape)
            if resident_int8 and k.rsplit("/", 1)[-1] == "kernel":
                flat[k[: -len("kernel")] + "kernel_q"] = jnp.asarray(codes).astype(jnp.int4)
                flat[k[: -len("kernel")] + "scale"] = resident_scale(raw[k + "::scale"])
                continue
            a = codes.astype(np.float32) * raw[k + "::scale"]
        elif kdt == "nf4":
            a = _dequantize_nf4(a, raw[k + "::scale"], tuple(int(s) for s in raw[k + "::shape"]))
        elif kdt == "bfloat16":
            a = a.view(jnp.bfloat16)
        flat[k] = a

    params = _unflatten(flat, spec.n_layers)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    if "lm_head" not in params:
        params["lm_head"] = None

    _validate_shapes(spec, params)
    return spec, params, _read_tokenizer_source(save_dir)


def _read_tokenizer_source(save_dir: str) -> str:
    tok_path = os.path.join(save_dir, "tokenizer_source.txt")
    if os.path.exists(tok_path):
        with open(tok_path) as f:
            return f.read().strip()
    return ""


def _validate_shapes(spec: ModelSpec, params: Dict) -> None:
    def check(name, got, want):
        if tuple(got) != tuple(want):
            raise ValueError(f"shape mismatch for {name}: got {tuple(got)}, want {tuple(want)}")

    def kern(p):  # full-precision or int8-resident
        return p["kernel_q"] if "kernel_q" in p else p["kernel"]

    emb_dim = spec.word_embed_proj_dim or spec.d_model
    check("embed_tokens", params["embed_tokens"].shape, (spec.vocab_size, emb_dim))
    for l, lp in enumerate(params["layers"]):
        check(f"layers/{l}/q", kern(lp["q"]).shape, (spec.d_model, spec.q_ranks[l]))
        check(f"layers/{l}/k", kern(lp["k"]).shape, (spec.d_model, spec.k_ranks[l]))
        check(f"layers/{l}/v", kern(lp["v"]).shape, (spec.d_model, spec.v_ranks[l]))
        check(f"layers/{l}/o", kern(lp["o"]).shape, (spec.o_ranks[l], spec.d_model))
        if spec.is_moe_layer(l):
            E, r = spec.n_experts, spec.gate_ranks[l]
            check(f"layers/{l}/router", kern(lp["router"]).shape, (spec.d_model, E))
            check(
                f"layers/{l}/experts/up",
                kern(lp["experts"]["up"]).shape,
                (E, spec.d_model, r),
            )
            check(
                f"layers/{l}/experts/down",
                kern(lp["experts"]["down"]).shape,
                (E, r, spec.d_model),
            )
            if spec.shared_d_int:
                rs = spec.shared_rank(l)
                check(
                    f"layers/{l}/shared/up",
                    kern(lp["shared"]["up"]).shape,
                    (spec.d_model, rs),
                )
                check(
                    f"layers/{l}/shared/down",
                    kern(lp["shared"]["down"]).shape,
                    (rs, spec.d_model),
                )
                if spec.shared_expert_gate:
                    check(
                        f"layers/{l}/shared_gate",
                        kern(lp["shared_gate"]).shape,
                        (spec.d_model, 1),
                    )
        else:
            check(f"layers/{l}/up", kern(lp["up"]).shape, (spec.d_model, spec.gate_ranks[l]))
            check(
                f"layers/{l}/down", kern(lp["down"]).shape, (spec.gate_ranks[l], spec.d_model)
            )
        if "rotary_mask" in lp:
            check(
                f"layers/{l}/rotary_mask",
                lp["rotary_mask"].shape,
                (spec.n_kv_heads, spec.k_ranks[l] // spec.n_kv_heads),
            )
