"""modegpt_tpu — TPU-native MoDeGPT: training-free modular decomposition of LLMs.

A ground-up JAX/XLA/Pallas re-design of the MoDeGPT compression pipeline
(MoDeGPT: Modular Decomposition for Large Language Model Compression,
ICLR 2025, arXiv 2408.09632; reference implementation cbacary/MoDeGPT).

Capabilities (feature parity with the reference, re-architected TPU-first):

* Calibration forward passes that stream per-module second-moment (Gram)
  statistics and Block-Influence scores — as functional taps inside a jitted
  forward, not PyTorch hooks (reference: src/calibration.py).
* Three closed-form module-wise decompositions:
  - Type-I  Nyström / ridge-leverage column selection for the MLP
    intermediate dimension              (reference: src/compression/compress_mlp.py)
  - Type-II CR column selection, RoPE-pair-aware, for the Q/K pair
                                        (reference: src/compression/compress_qk.py)
  - Type-III correlation-whitened SVD for the V/O pair
                                        (reference: src/compression/compress_vo.py)
* Global sparsity allocation across layers via a softmax over BI scores
  (reference: src/compression_utils.py:79).
* Pure-functional model surgery: heterogeneous per-layer ranks are
  first-class model config; no vendored "Rebuild" modeling files
  (reference: src/patchers/*.py are replaced by `modegpt_tpu.models`).
* Perplexity evaluation harness (reference: src/eval.py) and JSON metrics.
* Mesh parallelism (new capability, absent in the reference): data-sharded
  calibration with psum-reduced Gram accumulators and layer-parallel
  batched decomposition via shard_map.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # Some hosts (e.g. axon-tunneled TPU images) force-register their
    # platform from sitecustomize, overriding JAX_PLATFORMS from the
    # environment — an explicit CPU request then silently initializes
    # (and can hang on) the remote backend. Restore the standard JAX
    # contract: an explicit JAX_PLATFORMS=cpu wins for every entry
    # point (CLI, scripts, library imports). Config-level override is
    # honored at first backend init, so this is safe pre-initialization
    # and a no-op on hosts that already respect the env var.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # backends already initialized — caller's choice stands
        pass

from modegpt_tpu.config import CompressionConfig  # noqa: F401
