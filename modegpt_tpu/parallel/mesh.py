"""Device-mesh construction and sharding helpers.

New capability relative to the reference, which has no distributed
backend at all (SURVEY.md §2: a dormant two-GPU flag and HF
``device_map="auto"`` are its entire story, src/model_utils.py:21-31).

The TPU-native design (SURVEY.md §5 "Distributed communication backend"):

* ``data`` axis — calibration/eval batches are sharded over it; GSPMD
  inserts the psum that reduces Gram accumulators across shards (the
  statistics are plain sums over tokens, so data/sequence sharding is
  exact);
* ``model`` axis — tensor-parallel shardings for the forward (head- and
  d_int-sharded projections) and layer-parallel solver execution.

Collectives ride ICI when the mesh is built from `jax.devices()` of one
slice; multi-slice DCN layouts should put ``data`` on the outer
(slower) axis.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "maybe_initialize_distributed",
    "parse_mesh_shape",
    "make_mesh",
    "shard_batch",
    "param_shardings",
    "shard_serving",
]


def maybe_initialize_distributed() -> bool:
    """Initialize `jax.distributed` for multi-host meshes when a
    coordinator is configured; silently a no-op on a single host.

    TPU pods auto-detect peers from the pod metadata, so
    ``jax.distributed.initialize()`` needs no arguments there; other
    transports use the standard JAX coordinator env vars. Gated behind
    explicit configuration (MODEGPT_DISTRIBUTED=1 or a coordinator
    address) so single-host runs never pay the handshake. After
    initialization `jax.devices()` spans every host and `make_mesh`
    shapes can use the global device count; collectives ride ICI within
    a slice and DCN across slices (put "data" on the outer axis).
    """
    import os

    import jax

    want = (
        os.environ.get("MODEGPT_DISTRIBUTED", "") == "1"
        or bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
        or bool(os.environ.get("COORDINATOR_ADDRESS"))
    )
    if not want:
        return False
    try:
        jax.distributed.initialize()
        return True
    except RuntimeError as e:
        # idempotent callers: "already initialized" is fine; anything else
        # (unreachable coordinator, backends already created) must FAIL
        # loudly — silently running single-host would compute wrong results
        if "already" in str(e).lower():
            return jax.process_count() > 1
        raise


def parse_mesh_shape(mesh_shape: str) -> Dict[str, int]:
    """Parse "data:4,model:2" into {"data": 4, "model": 2}."""
    out: Dict[str, int] = {}
    if not mesh_shape:
        return out
    for part in mesh_shape.split(","):
        name, _, size = part.partition(":")
        out[name.strip()] = int(size)
    return out


def make_mesh(mesh_shape: str = "", devices=None) -> Optional[Mesh]:
    """Build a Mesh from a "name:size,..." spec.

    Empty spec -> None (single-device execution): meshes are explicit
    opt-in so small-batch runs on many-device hosts don't silently
    acquire divisibility constraints. Batch sizes must divide the
    ``data`` axis when a mesh is used.
    """
    devices = list(devices if devices is not None else jax.devices())
    axes = parse_mesh_shape(mesh_shape)
    if not axes:
        return None
    total = int(np.prod(list(axes.values())))
    if total > len(devices):
        raise ValueError(f"mesh {axes} needs {total} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:total]).reshape(tuple(axes.values()))
    return Mesh(dev_array, tuple(axes.keys()))


def shard_batch(mesh: Mesh, batch):
    """Place a [B, T] batch sharded along the data axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data", None)))


def param_shardings(mesh: Mesh, spec, params) -> Dict:
    """Tensor-parallel sharding rules for the forward pass.

    Projections are sharded over the ``model`` axis on their head/d_int
    output dim (column-parallel q/k/v/up/gate, row-parallel o/down —
    the Megatron layout expressed as GSPMD annotations):

      q/k/v kernel [d, H*hd]    -> P(None, "model")
      o kernel     [H*hd, d]    -> P("model", None)
      up/gate      [d, d_int]   -> P(None, "model")
      down         [d_int, d]   -> P("model", None)
      embeddings / norms        -> replicated
      experts      [E, ..., ..] -> P("model", None, None)  (expert parallel:
                                   each device holds E/n whole experts; the
                                   routed-weighted sum becomes one psum)

    XLA then inserts exactly one psum per attention/MLP block (the o/down
    row-parallel reduction; the expert-dim reduction for MoE).
    """
    if "model" not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)

    col = NamedSharding(mesh, P(None, "model"))
    row = NamedSharding(mesh, P("model", None))
    rep = NamedSharding(mesh, P())
    bias_col = NamedSharding(mesh, P("model"))
    n_model = mesh.shape["model"]
    ep = NamedSharding(mesh, P("model", None, None))

    def layer_sharding(lp: Dict) -> Dict:
        out = {}
        for name, sub in lp.items():
            if name in ("q", "k", "v", "up", "gate"):
                out[name] = {"kernel": col}
                if "bias" in sub:
                    out[name]["bias"] = bias_col
            elif name in ("o", "down"):
                out[name] = {"kernel": row}
                if "bias" in sub:
                    out[name]["bias"] = rep
            elif name == "experts" and spec.n_experts % n_model == 0:
                out[name] = {k: {"kernel": ep} for k in sub}
            elif name == "shared":
                # shared expert = dense MLP: Megatron column/row split
                out[name] = {
                    "gate": {"kernel": col},
                    "up": {"kernel": col},
                    "down": {"kernel": row},
                }
            else:
                out[name] = jax.tree_util.tree_map(lambda _: rep, sub)
        return out

    shardings = {
        k: jax.tree_util.tree_map(lambda _: rep, v)
        for k, v in params.items()
        if k != "layers" and v is not None
    }
    if params.get("lm_head") is None:
        shardings["lm_head"] = None
    shardings["layers"] = [layer_sharding(lp) for lp in params["layers"]]
    return shardings


def shard_serving(mesh: Mesh, pm, state):
    """Tensor-parallel placement for the serving stack: returns the
    (PaddedModel, ServeState) pair device_put with Megatron shardings
    over the mesh's ``model`` axis.

    The padded stack's [L, ...] leaves get the param_shardings layout
    shifted one axis right (L leads and stays replicated); the K/V
    cache pools [L, slots, Hk, max_len, R] shard their KV-HEAD axis over
    "model", matching the k/v projections so decode's cache scatter and
    the grouped attention contraction stay local — one psum per block
    (o/down row-parallel reduction) is the only collective per step.
    The jitted serving programs are unchanged: GSPMD propagates these
    committed input shardings through them.

    Requires n_kv_heads % model-axis == 0 (head-sharded attention).
    """
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        rep = NamedSharding(mesh, P())
        put = lambda t: jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), t)
        return pm._replace(layers=put(pm.layers), other=put(pm.other)), jax.tree_util.tree_map(
            lambda a: jax.device_put(a, rep), state
        )
    n_model = mesh.shape["model"]
    spec = pm.spec
    if spec.n_kv_heads % n_model != 0:
        raise ValueError(
            f"serving TP needs n_kv_heads ({spec.n_kv_heads}) divisible by "
            f"the model axis ({n_model})"
        )

    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, None, "model"))  # [L, d, out]
    row = NamedSharding(mesh, P(None, "model", None))  # [L, in, d]
    bias_col = NamedSharding(mesh, P(None, "model"))
    ep = NamedSharding(mesh, P(None, "model", None, None))  # [L, E, ., .]

    ep_scale = NamedSharding(mesh, P(None, "model", None))  # [L, E, out]

    def lin(sub, ker, sc, b):
        # Works for plain ({kernel}), weight-only int8 ({kernel_q, scale})
        # and W8A8-view ({kernel_qa, scale}) linears: codes shard like the
        # kernel they replace; the per-out-channel scale follows the OUT
        # axis (sharded for column-parallel, replicated for row-parallel).
        out = {}
        for k in sub:
            if k in ("kernel", "kernel_q", "kernel_qa"):
                out[k] = ker
            elif k == "scale":
                out[k] = sc
            elif k == "bias":
                out[k] = b
            else:
                out[k] = rep
        return out

    def leaf(name, sub):
        if name in ("q", "k", "v", "up", "gate"):
            return lin(sub, col, bias_col, bias_col)
        if name in ("o", "down"):
            return lin(sub, row, rep, rep)
        if name == "experts" and spec.n_experts % n_model == 0:
            return {k: lin(v, ep, ep_scale, rep) for k, v in sub.items()}
        if name == "shared":
            return {
                "gate": lin(sub["gate"], col, bias_col, bias_col),
                "up": lin(sub["up"], col, bias_col, bias_col),
                "down": lin(sub["down"], row, rep, rep),
            }
        return jax.tree_util.tree_map(lambda _: rep, sub)

    layer_sh = {name: leaf(name, sub) for name, sub in pm.layers.items()}
    layers = jax.tree_util.tree_map(jax.device_put, pm.layers, layer_sh)
    other = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), pm.other)

    cache_sh = NamedSharding(mesh, P(None, None, "model", None, None))
    scale_sh = NamedSharding(mesh, P(None, None, "model", None))
    state = state._replace(
        cache_k=jax.device_put(state.cache_k, cache_sh),
        cache_v=jax.device_put(state.cache_v, cache_sh),
        lengths=jax.device_put(state.lengths, rep),
        last_token=jax.device_put(state.last_token, rep),
        k_scale=None if state.k_scale is None else jax.device_put(state.k_scale, scale_sh),
        v_scale=None if state.v_scale is None else jax.device_put(state.v_scale, scale_sh),
    )
    return pm._replace(layers=layers, other=other, q_hd_true=jax.device_put(pm.q_hd_true, rep)), state
