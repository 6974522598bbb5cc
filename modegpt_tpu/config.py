"""Compression configuration + reflection-generated CLI.

Knob-for-knob compatible with the reference's `CompressionConfig`
(reference: src/adapters/CompressionConfig.py) — same field names, same
defaults, same auto-generated ``--flag`` per dataclass field and the same
dict-protocol access — plus TPU-native knobs (mesh shape, solver
precision, layer chunking).
"""

from __future__ import annotations

import argparse
from dataclasses import MISSING, dataclass, field, fields
from typing import Optional, get_args, get_origin

__all__ = ["CompressionConfig"]


@dataclass
class CompressionConfig:
    # ---- reference-compatible knobs (src/adapters/CompressionConfig.py:8-35) ----
    model: str = "facebook/opt-125m"
    device: int = 0
    output_dir: str = "compressed_output"
    temp_storage_dir: str = "./compressed_output/layers/"

    dataset: str = "wikitext"

    nystrom_ridge: float = 1e-2

    order: Optional[str] = "mlp,qk,vo"

    calib_size: int = 32
    calibs_batch_size: int = 4

    compression_ratio: float = 0.5
    note: str = "NA"

    max_sparsity: float = 0.8
    sparsity_smoothing: float = 0.15

    ridge_vo: float = 1e-4
    ridge_qk: float = 1e-6

    # QK method: 'cr' (column selection, default) or 'svd' (whitened SVD of
    # the QK bilinear form — non-RoPE archs only; the reference ships this
    # unused at compress_qk.py:16-148 noting better OPT performance)
    qk_method: str = "cr"

    debug: bool = False

    # ---- TPU-native knobs (new capability) ----
    seq_len: int = 2048
    eval_batch_size: int = 16
    eval_max_samples: int = 512
    solver_precision: str = "f64_cpu"  # f64_cpu (parity) | f32_device (speed)
    layers_per_step: int = 48  # calibration layer-chunk size (reference: run_modegpt.py:107)
    mesh_shape: str = ""  # e.g. "data:4,model:2"; empty = single device
    model_dtype: str = "float32"  # forward dtype: float32 | bfloat16
    metrics_dir: str = "./metrics"
    profile_dir: str = ""  # jax.profiler trace output; empty = disabled
    shard_sequence: bool = False  # sequence-parallel calibration over the model axis
    shard_stats: bool = False  # layer-shard Gram accumulators over the data axis
    seed: int = 1234
    skip_baseline_eval: bool = False
    skip_final_eval: bool = False
    use_flash_attention: bool = True
    # Heterogeneous-rank execution: 'unrolled' compiles one XLA body per
    # layer (exact shapes); 'padded' zero-pads to the stack max and scans
    # (layer-count-independent compile, see models/padded.py); 'auto'
    # picks padded when the FLOP overhead is small.
    compressed_exec: str = "auto"
    # Artifact storage: '' follows model_dtype; int8/int4/nf4 = weight-only
    # symmetric per-channel quantization (~4x smaller than f32).
    artifact_dtype: str = ""
    # 'npz' (single file) or 'orbax' (async multi-host tensorstore).
    artifact_backend: str = "npz"
    # Gram-tap MXU precision: 'highest' (6-pass f32, reference-parity
    # oracle), 'high' (3-pass, ~2x gram throughput), 'bf16' (single
    # pass with f32 accumulation, ~6x; factor deviation vs the highest
    # oracle is measured in tests/test_calibration.py).
    gram_precision: str = "highest"
    # Calibration execution: 'auto' picks the scanned stats program
    # (fast, but stacks a second copy of the layer weights) or unrolled;
    # 'window' forces the windowed single-program path (weights consumed
    # in place, one compile per layers_per_step sweep) for models whose
    # weights fill most of device memory.
    calib_exec: str = "auto"
    # Streamed-sweep window flush (compress/offload.py): 'auto'/'on'
    # submit each dense window's ENTIRE flush — on-device solve plus the
    # HBM->host factor fetch — to a single background worker, so the
    # D2H drain (the streamed path's idle time on tunneled hosts,
    # ~25-50 MB/s) and the solve both overlap the next layers' staging +
    # compute. The solve therefore RACES the sweep's dispatches; 'auto'
    # only enables this when an HBM estimate says the flush working set
    # fits beside the sweep (and falls back to sync on a worker
    # RESOURCE_EXHAUSTED). 'off' solves+fetches on the main thread. MoE
    # windows always flush synchronously (their [E, d_int, d_int] taps
    # and expert factor stacks are too big to pipeline).
    stream_async_flush: str = "auto"
    # Max windows whose solve+fetch may trail the sweep. Each pending
    # window pins its FULL working set in HBM until its worker flush
    # completes: the window's taps (cov_mlp [d_int,d_int] f32 + cov_x +
    # Q/K grams), its slimmed staged kernel tree, and — while its solve
    # runs — the Type-I workspace (~2x [d_int,d_int] f32). Depth is NOT
    # cheap: each extra unit pins one more window of taps
    # (offload._flush_hbm_estimate's (depth-1)*taps term), and raising
    # it past what HBM fits reproduces the RESOURCE_EXHAUSTED documented
    # at offload.py's auto-depth resolution. 0 = auto: 2 when a known
    # HBM budget says the extra window's taps fit beside the solve
    # workspace, else 1 (the proven double-buffer). Raise manually only
    # when streamed stats show flush_wait_s >> 0 AND the HBM estimate
    # has slack.
    stream_flush_depth: int = 0
    # Streamed-sweep drop recovery (compress/offload.py): snapshot the
    # activation stacks to host every N layers so a transient backend
    # connection drop (tunneled hosts) reconnects in process and resumes
    # from the last snapshot instead of losing the hour-scale capture.
    # 0 = auto (8 for host-staged sweeps on a real accelerator, off
    # elsewhere), -1 = off, N > 0 forces. Each snapshot costs one stack
    # D2H (~10 s at 32B geometry); dense release is deferred to
    # checkpoint boundaries while active (<= N layers of extra host
    # residency).
    stream_checkpoint_every: int = 0
    # Precision the BI-allocation prepass stages weights at
    # (compress/offload.py stream_bi_sweep). The prepass is one full-
    # model H2D pass whose only product is the per-layer Block-Influence
    # ranking (reference: calibration.py:118-124) — a smoothed softmax
    # over layer saliencies, insensitive to sub-percent forward error.
    # 'int8'/'int4' stage symmetric per-row-quantized weights and
    # dequantize on device, cutting the prepass link bytes 2x/4x; the
    # tap/solve sweep always stages full-precision weights. 'auto' =
    # int8 when weights are host-staged on a real accelerator (the
    # beyond-HBM tunneled case where the prepass is link-bound), bf16
    # (exact) otherwise. Measured keep-ratio deviation vs the exact
    # prepass is bounded in tests/test_offload.py.
    bi_stage_dtype: str = "auto"
    # Where the streamed sweep's window factors land (compress/offload.py):
    # 'host' fetches each window's factors to host numpy (what persistence
    # needs, and the only option for beyond-HBM host-staged weights —
    # dense weights and factors must never coexist on device there);
    # 'device' keeps them as model-dtype device slices for zero-copy
    # surgery — the in-memory compress-then-serve job then pays NO
    # HBM->host factor transfer at all (on tunneled hosts that link is
    # ~30 MB/s and dominates the streamed e2e). Device fetch pairs with
    # release_params: factors replace the released dense kernels, so HBM
    # shrinks monotonically over the sweep.
    stream_fetch: str = "host"
    # Fused compression (compress/fused.py): the whole calibrate ->
    # allocate -> solve -> surgery job in 3 dispatches + 1 tiny fetch.
    # Dense RoPE-family stacks only; bypasses the factor store/resume.
    fused: bool = False
    # Free each dense projection as its compressed kernel is built
    # (surgery mutates the in-memory params): required when dense +
    # compressed weights together exceed device memory (7B on one v5e).
    release_dense: bool = False

    _FIELD_HELP = {
        "order": "mlp,qk,vo  -- <method>,<method>,<method>",
        "solver_precision": "f64_cpu (reference-parity) or f32_device (TPU-speed)",
        "mesh_shape": "device mesh, e.g. 'data:4,model:2'; empty = single device",
    }

    @classmethod
    def _cli_spec(cls) -> dict:
        """Field name -> argparse add_argument kwargs, derived once from
        the dataclass's resolved type hints (cached on the class — the
        hint resolution is the expensive part and every parse needs the
        spec twice). Bools become paired ``--flag/--no-flag`` switches;
        Optional[X] unwraps to X; a field without a default becomes a
        required flag."""
        cached = cls.__dict__.get("_cli_spec_cache")
        if cached is not None:
            return cached
        import typing

        hints = typing.get_type_hints(cls)
        spec: dict = {}
        for f in fields(cls):
            if not f.init or f.name.startswith("_"):
                continue
            hint = hints.get(f.name, str)
            union_members = [a for a in get_args(hint) if a is not type(None)]
            if union_members:
                hint = union_members[0]
            if hint is bool:
                kwargs = {"action": argparse.BooleanOptionalAction, "default": f.default}
            elif f.default is MISSING:
                kwargs = {"type": hint, "required": True}
            else:
                kwargs = {"type": hint, "default": f.default}
            help_text = cls._FIELD_HELP.get(f.name)
            if help_text:
                kwargs["help"] = help_text
            spec[f.name] = kwargs
        cls._cli_spec_cache = spec
        return spec

    @classmethod
    def make_parser(cls, parser: Optional[argparse.ArgumentParser] = None):
        parser = parser or argparse.ArgumentParser(prog="modegpt-tpu")
        for name, kwargs in cls._cli_spec().items():
            parser.add_argument(f"--{name}", **kwargs)
        return parser

    @classmethod
    def from_args(cls, args=None) -> "CompressionConfig":
        namespace = cls.make_parser().parse_args(args)
        values = {name: getattr(namespace, name) for name in cls._cli_spec()}
        return cls(**values).validate()

    def validate(self) -> "CompressionConfig":
        """Fail fast on invalid knob combinations."""
        if self.solver_precision not in ("f64_cpu", "f32_device"):
            raise ValueError(
                f"solver_precision must be f64_cpu or f32_device, got {self.solver_precision!r}"
            )
        if not (0.0 <= self.compression_ratio < 1.0):
            raise ValueError(f"compression_ratio must be in [0, 1), got {self.compression_ratio}")
        if not (0.0 < self.max_sparsity <= 1.0):
            raise ValueError(f"max_sparsity must be in (0, 1], got {self.max_sparsity}")
        if self.qk_method not in ("cr", "svd"):
            raise ValueError(f"qk_method must be cr or svd, got {self.qk_method!r}")
        if self.compressed_exec not in ("auto", "unrolled", "padded"):
            raise ValueError(
                f"compressed_exec must be auto, unrolled or padded, got {self.compressed_exec!r}"
            )
        if self.artifact_dtype not in ("", "float32", "bfloat16", "int8", "int4", "nf4"):
            raise ValueError(
                f"artifact_dtype must be float32, bfloat16, int8, int4, nf4 or empty, "
                f"got {self.artifact_dtype!r}"
            )
        if self.artifact_backend not in ("npz", "orbax"):
            raise ValueError(
                f"artifact_backend must be npz or orbax, got {self.artifact_backend!r}"
            )
        if self.calib_exec not in ("auto", "window", "stream"):
            raise ValueError(
                f"calib_exec must be auto, window or stream, got {self.calib_exec!r}"
            )
        if self.stream_async_flush not in ("auto", "on", "off"):
            raise ValueError(
                f"stream_async_flush must be auto, on or off, "
                f"got {self.stream_async_flush!r}"
            )
        if int(self.stream_flush_depth) < 0:
            raise ValueError(
                f"stream_flush_depth must be >= 0 (0 = auto), "
                f"got {self.stream_flush_depth!r}"
            )
        if self.bi_stage_dtype not in ("auto", "bf16", "int8", "int4"):
            raise ValueError(
                f"bi_stage_dtype must be auto, bf16, int8 or int4, "
                f"got {self.bi_stage_dtype!r}"
            )
        if self.stream_fetch not in ("host", "device"):
            raise ValueError(
                f"stream_fetch must be host or device, got {self.stream_fetch!r}"
            )
        if self.gram_precision not in ("highest", "high", "bf16"):
            raise ValueError(
                f"gram_precision must be highest, high or bf16, got {self.gram_precision!r}"
            )
        if self.model_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"model_dtype must be float32 or bfloat16, got {self.model_dtype!r}")
        order = self.order or "mlp,qk,vo"
        for tok in order.split(","):
            if tok.strip() not in ("mlp", "qk", "vo"):
                raise ValueError(f"order token {tok!r} not in (mlp, qk, vo)")
        if self.calibs_batch_size <= 0 or self.calib_size <= 0:
            raise ValueError("calib_size and calibs_batch_size must be positive")
        return self

    # dict protocol (reference: CompressionConfig.py:82-91)
    def get(self, key: str, default=None):
        val = getattr(self, key, default)
        return val if val is not None else default

    def __getitem__(self, key: str):
        return getattr(self, key)

    def __contains__(self, key: str) -> bool:
        return hasattr(self, key)

    def to_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in fields(self) if not f.name.startswith("_")}
