"""Layer-batched solver execution — one XLA program per stage.

The reference loops solvers sequentially per layer and per head
(reference: compress_mlp.py:82, compress_qk.py:174/240, compress_vo.py:34/58).
On TPU that shape is wrong twice over: XLA compile time is paid per
distinct rank, and tiny per-head ops can't feed the MXU. This module
restructures a whole layer chunk into fixed-shape, rank-independent
device programs:

* Type-I MLP: `nystrom_mlp_padded` vmapped over the layer stack at a
  uniform pad rank (identity block padding is exact — see ops/mlp.py);
  per-layer slicing on the host.
* Type-II QK: scores are ridged covariance DIAGONALS (see ops/qk.py) —
  pure numpy on the host; selection and row gathers are host-side too
  (they're memory moves, not FLOPs).
* Type-III VO: rank-independent full factor forms
  (`vo_full_factors`) vmapped over layers; host slices each layer's
  rank.

Everything here is bit-identical to the per-layer path (tested in
tests/test_batched.py); it's purely an execution-shape change.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from modegpt_tpu.calib.engine import CalibrationResult
from modegpt_tpu.compress.surgery import compress_ranks_for_layer
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models.spec import ModelSpec
from modegpt_tpu.ops.mlp import (
    nystrom_factor_padded,
    nystrom_mlp_padded,
    nystrom_select_padded,
)
from modegpt_tpu.ops.qk import DEFAULT_SQRT_RIDGE
from modegpt_tpu.ops.vo import vo_factors_from_full, vo_full_factors
from modegpt_tpu.utils.precision import solver_dtype, solver_placement

logger = logging.getLogger("modegpt_tpu")

__all__ = ["solve_chunk_batched"]


def _hf_w(lp: Dict, name: str) -> np.ndarray:
    """Forward kernel [in, out] -> HF [out, in], on the host."""
    return np.asarray(lp[name]["kernel"]).T


def _hf_w_dev(lp: Dict, name: str) -> jax.Array:
    """Same, but as a device op (no host round-trip)."""
    return jnp.asarray(lp[name]["kernel"]).T


# One layer's [D, D] covariance above this size triggers the sequenced
# low-memory MLP solve (7B-scale d_int beside a resident model).
_LOWMEM_COV_BYTES = 4e8


@jax.jit
def _lowmem_down(C, down_kernel, idx, valid):
    """Padded down re-solve reading the resident [D, d] down kernel in
    place (cross = C[idx,:] @ W_d^T and W_d^T IS the kernel); bf16 ->
    f32/f64 upcast is exact, so this matches the stacked path bit for
    bit. Returns HF down [d, pad] with invalid columns zeroed."""
    from modegpt_tpu.ops.mlp import NYSTROM_SOLVE_RIDGE
    from modegpt_tpu.ops.psd import cholesky_solve_ridged

    pad = idx.shape[0]
    C_SS = C[idx][:, idx]
    eye = jnp.eye(pad, dtype=C.dtype)
    keep2d = valid[:, None] & valid[None, :]
    C_SS = jnp.where(keep2d, C_SS, eye)
    cross = jnp.where(valid[:, None], C[idx, :] @ down_kernel.astype(C.dtype), 0.0)
    down_T = cholesky_solve_ridged(C_SS, cross, NYSTROM_SOLVE_RIDGE)
    return jnp.where(valid[:, None], down_T, 0.0).T


@jax.jit
def _lowmem_rows(kernel, idx, valid):
    """HF factor rows [pad, d] gathered from a resident [d, D] kernel,
    upcast to f32 after the gather (exact for bf16 inputs)."""
    rows = jnp.take(kernel, idx, axis=1).T.astype(jnp.float32)
    return jnp.where(valid[:, None], rows, 0.0)


# Per-(layer, expert) lowmem solve for beyond-HBM MoE geometry, split so
# the resident [E, D, D] tap stack is an operand ONLY of the two
# programs that read it (select, operand extraction) and never sits
# beside the Cholesky workspace: at Mixtral geometry the stack is
# 6.6 GB, the staged expert kernels 2.8 GB, and a monolithic solve's
# gather+workspace arena (~4-5 GB at pad ~= d_int) tipped the 16 GB
# chip over (bench_results/r03: moe8 RESOURCE_EXHAUSTED inside
# _lowmem_down). The expert index is a traced scalar, so all four
# programs compile once and serve every (layer, expert) pair.
def _select_from_stack(stack, e, rank, pad, ridge):
    C = jax.lax.dynamic_index_in_dim(stack, e, 0, keepdims=False)
    return nystrom_select_padded(C, rank, pad, ridge)


_select_stack_lowmem = jax.jit(_select_from_stack, static_argnums=(3,))


@jax.jit
def _extract_down_operands(stack, e, down_kernel, idx, valid):
    """C_SS [pad, pad] + masked cross [pad, d] read straight off the
    stacked taps and the resident bf16 down kernel (exact upcast)."""
    C = jax.lax.dynamic_index_in_dim(stack, e, 0, keepdims=False)
    pad = idx.shape[0]
    C_rows = C[idx, :]
    C_SS = C_rows[:, idx]
    eye = jnp.eye(pad, dtype=C.dtype)
    keep2d = valid[:, None] & valid[None, :]
    C_SS = jnp.where(keep2d, C_SS, eye)
    cross = jnp.where(valid[:, None], C_rows @ down_kernel.astype(C.dtype), 0.0)
    return C_SS, cross


def _down_from_operands(C_SS, cross, valid):
    from modegpt_tpu.ops.mlp import NYSTROM_SOLVE_RIDGE
    from modegpt_tpu.ops.psd import cholesky_solve_ridged

    down_T = cholesky_solve_ridged(C_SS, cross, NYSTROM_SOLVE_RIDGE)
    return jnp.where(valid[:, None], down_T, 0.0).T


_down_solve_lowmem = jax.jit(_down_from_operands, donate_argnums=(0, 1))


# Two-phase batched Type-I (ops/mlp.py split entries): the selection
# pass's Cholesky-inverse workspace retires before the factor pass
# allocates its [pad, D] gathers, and the factor pass's donated inputs
# (the cov/weight chunk copies — dead afterwards) free into its arena.
_select_padded_batched = jax.jit(
    jax.vmap(nystrom_select_padded, in_axes=(0, 0, None, None)),
    static_argnums=(2,),
)
_factor_padded_batched = jax.jit(
    jax.vmap(nystrom_factor_padded), donate_argnums=(0, 1, 2, 3)
)


def _stack_covs(covs: Dict[int, object], layers, dt, use_dev: bool) -> jax.Array:
    vals = [covs[l] for l in layers]
    if isinstance(vals[0], jax.Array) and use_dev:
        return jnp.stack(vals).astype(dt)
    return jnp.asarray(np.stack([np.asarray(v) for v in vals]), dtype=dt)


def _stack_w(layer_params, layers, name: str, dt, use_dev: bool) -> jax.Array:
    if use_dev:
        return jnp.stack([_hf_w_dev(layer_params[l], name) for l in layers]).astype(dt)
    return jnp.asarray(np.stack([_hf_w(layer_params[l], name) for l in layers]), dtype=dt)


def _diag_host(cov) -> np.ndarray:
    """Per-head covariance diagonals on the host (fetches [H, hd] only)."""
    if isinstance(cov, jax.Array):
        return np.asarray(jnp.diagonal(cov, axis1=-2, axis2=-1), dtype=np.float64)
    return np.einsum("hii->hi", cov)


def _shard_layers(arrs, ranks_arr, mesh):
    """Shard stacked per-layer arrays over the mesh's first axis —
    layers are embarrassingly parallel, so GSPMD partitions the vmapped
    solver with zero communication. Pads the layer axis to the axis size
    (padding rows are discarded by the host slicing)."""
    if mesh is None:
        return arrs, ranks_arr, arrs[0].shape[0]
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    L = arrs[0].shape[0]
    pad = (-L) % n
    out = []
    for x in arrs:
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        out.append(jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))))
    if pad:
        ranks_arr = jnp.concatenate([ranks_arr, jnp.repeat(ranks_arr[-1:], pad, axis=0)])
    ranks_arr = jax.device_put(ranks_arr, NamedSharding(mesh, P(axis)))
    return out, ranks_arr, L


def _topk_desc(scores: np.ndarray, k: int) -> np.ndarray:
    """Descending top-k indices with lower-index tie-breaks — matches
    jax.lax.top_k and torch.topk ordering."""
    return np.argsort(-scores, kind="stable")[:k]


def _mlp_layers_per_program(spec, pad: int, mesh, d_int: int = 0) -> int:
    """Memory-aware sub-chunking for the batched MLP solve.

    Per layer the padded Nystrom holds roughly cov [D,D], gathered C_SS
    [pad,pad] (+ Cholesky workspace), cross terms [pad,d], three weight
    stacks and outputs — about 4*(2*D^2 + 3*pad^2 + 6*pad*d + 3*D*d)
    bytes in f32, times ~1.5 for XLA temporaries. Bound the stack so the
    solve fits alongside the resident model + stats."""
    d, D = spec.d_model, d_int or spec.d_int
    # 3x headroom: XLA keeps gather intermediates (C[idx] is [pad, D]),
    # the Cholesky workspace, and double-buffered outputs live together.
    per_layer = 4 * (2 * D * D + 3 * pad * pad + 6 * pad * d + 3 * D * d) * 3.0
    budget = 5e9  # conservative HBM slice for the solver program
    try:
        import jax as _jax

        stats = _jax.local_devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            # leave room for resident params + on-device calibration stats
            budget = 0.35 * limit
    except Exception:
        pass
    n = max(1, int(budget // per_layer))
    if mesh is not None:
        axis = mesh.shape[mesh.axis_names[0]]
        n = max(axis, (n // axis) * axis)  # keep shardable multiples
    return n


def _fetch_dtype(config):
    """bf16 artifacts (the reference always saves bf16, model_utils.py:111)
    lose nothing if the factors already cross the HBM->host link in bf16 —
    and the link is the solve bottleneck on tunneled hosts."""
    return jnp.bfloat16 if config.model_dtype == "bfloat16" else None


class _FetchCounter:
    """Bytes that actually crossed the HBM->host link through _fetch —
    the streamed sweep reads the delta for its bench stats (the link is
    the beyond-HBM bottleneck: measured serialised ~33 MB/s D2H,
    scripts/probe_duplex.py). Thread-safe: async window flushes fetch
    from a worker thread."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self.total = 0

    def add(self, n: int) -> None:
        with self._lock:
            self.total += n


FETCHED_BYTES = _FetchCounter()


def _fetch(a, fdt):
    out = np.asarray(a.astype(fdt) if fdt is not None else a)
    FETCHED_BYTES.add(out.nbytes)
    return out


_FETCH_GRID = 512  # device-side slice/pad sizes rounded up to this


def _grid_pad(n: int, dim: int) -> int:
    """Round ``n`` up to the _FETCH_GRID, capped at ``dim``. Coarse-grid
    sizes collapse device-program shape signatures (per-layer ranks are
    near-arbitrary integers; exact sizes compile O(distinct values)
    programs — each a full AOT round trip on remote backends). Padded
    solve entries stay exact regardless of pad (identity block,
    ops/mlp.py); fetch pads are trimmed on the host."""
    return min(dim, -(-int(n) // _FETCH_GRID) * _FETCH_GRID)


def _global_rank_hint(spec, keep_ratios, suffix: str) -> int:
    """Max rank across ALL layers of the model, not just this call's
    chunk. Feeding it into the solver grid pads makes every window/chunk
    compile the SAME program: the streamed path flushes 1-layer windows,
    and per-window pads (each window's own max rank on the 512-grid)
    still compiled ~5 distinct [pad, pad] solver programs per factor
    kind at 7B — each a full AOT round trip on remote backends. Padded
    entries are exact regardless of pad (identity block, ops/mlp.py), so
    the only cost is the smaller layers' Cholesky running at the global
    pad. Requires the full per-layer allocation (len == n_layers);
    chunk-local keep lists fall back to the chunk max."""
    if len(keep_ratios) != spec.n_layers:
        return 0
    return max(
        compress_ranks_for_layer(spec, keep_ratios[l], suffix)
        for l in range(spec.n_layers)
    )


def _fetch_ragged(stack, ranks, fdt, axis: int):
    """Fetch per-layer slices of a padded [n, ...] stack in ONE
    HBM->host transfer: slice the stack device-side to the max rank
    (rounded up to _FETCH_GRID), fetch once, trim exactly on the host.
    The tunnel/DCN link is latency-bound, so one transfer beats n small
    ones by ~10x (measured: the per-layer fetch loop was 2.1s of a 2.4s
    MLP solve). The grid rounding collapses the device program's shape
    signature: per-layer ranks are near-arbitrary integers, so slicing
    each rank exactly compiled O(layers) distinct tiny programs per
    factor kind — each one a full AOT round trip on remote backends
    (census: 46 of the streamed path's 128 programs came from here)."""
    # Drain the queue first: a tiny fetch completes only once the solve
    # program retires, so its temp arena is free before the slice buffer
    # allocates — at 7B scale the resident weights leave no room for
    # both (enqueue-time allocation otherwise overlaps them).
    lead = jax.tree_util.tree_leaves(stack)[0]
    np.asarray(lead[(0,) * lead.ndim])  # scalar index: no ravel copy

    dim = stack.shape[1 + axis]  # axis indexes the per-layer entry dims
    rpad = _grid_pad(max(ranks), dim)
    sl = [slice(None)] * stack.ndim
    sl[1 + axis] = slice(0, rpad)
    flat = _fetch(stack[tuple(sl)], fdt)  # [n, ..., rpad, ...] one fetch
    out = []
    for i, r in enumerate(ranks):
        s = [slice(None)] * (flat.ndim - 1)
        s[axis] = slice(0, r)
        out.append(flat[(i, *s)])
    return out


def _solve_mlp_moe(
    spec, layer_params, layers, ranks, calib, config, dt, use_dev, mesh=None, fetch="host",
    shared_ranks=None, pad_hint=0, shared_pad_hint=0, scratch_params=False,
    host_params=None,
) -> Dict[int, Dict]:
    """Per-expert Type-I solves for MoE layers: the (layer, expert) pairs
    are one flat batch through the SAME padded Nystrom program as the
    dense path — each expert is solved against the Gram of its own routed
    tokens, all experts of a layer share the layer's rank (so the expert
    stack stays uniform-shaped).

    Memory-aware two ways: when the budget fits several whole layers, the
    batch is (step layers x E experts); when ONE layer's expert stack
    exceeds the budget (Mixtral geometry: 8 experts at d_int 14336 on a
    16 GB chip), experts are chunked e_step at a time and each chunk is
    its own program — covariances are sliced per chunk BEFORE stacking so
    nothing materialises the full [E, D, D] twice."""
    E = spec.n_experts
    fdt = _fetch_dtype(config)
    # Host-side factor reconstruction (see _solve_mlp_dense): expert
    # up/gate factors are row slices of expert kernels the host already
    # holds — gather there and keep ~2/3 of the MoE factor bytes off the
    # HBM->host link (moe8: 15.1 GB fetched in r03, mostly these).
    host_moe = (
        fetch == "host"
        and host_params is not None
        and all(l in host_params for l in layers)
    )

    def _host_expert_rows(l, name, e, idx_r):
        kern = np.asarray(host_params[l]["experts"][name]["kernel"][e])
        tgt = fdt if fdt is not None else np.float32
        return kern[:, idx_r].T.astype(tgt, copy=False)

    # grid pad (identity-block exact): per-window streamed calls
    # otherwise compile one expert-solve program per distinct layer rank
    pad_all = _grid_pad(max([*ranks, pad_hint]), spec.d_int)
    units = _mlp_layers_per_program(spec, pad_all, mesh)  # (layer, expert) units
    step = max(1, units // E)
    e_step = E if units >= E else max(1, units)

    def stack_e(sub, name, es):
        # expert kernels [E, in, out] -> HF [out, in] per unit, chunk es
        if use_dev:
            w = jnp.stack(
                [
                    jnp.transpose(layer_params[l]["experts"][name]["kernel"][es], (0, 2, 1))
                    for l in sub
                ]
            )
        else:
            w = jnp.asarray(
                np.stack(
                    [
                        np.transpose(
                            np.asarray(layer_params[l]["experts"][name]["kernel"][es]),
                            (0, 2, 1),
                        )
                        for l in sub
                    ]
                )
            )
        return w.astype(dt).reshape((len(sub) * w.shape[1],) + w.shape[2:])

    out = {}
    pieces: Dict[int, Dict[str, list]] = {}
    if (
        use_dev
        and mesh is None
        and spec.d_int ** 2 * jnp.dtype(dt).itemsize > _LOWMEM_COV_BYTES
    ):
        # Beyond-HBM MoE geometry (Mixtral: E=8, d_int 14336 -> the
        # resident [E, D, D] tap stack alone is 6.6 GB of a 16 GB chip):
        # even ONE expert's batched solve next to it RESOURCE_EXHAUSTEDs.
        # Per (layer, expert), run FOUR drained programs — select,
        # operand extraction, Cholesky solve, row gathers — sliced off
        # the tap stack IN-PROGRAM (no materialised [D, D] cov copy) and
        # reading the resident bf16 expert kernels in place (exact
        # upcast). The stack is an operand only of the two programs
        # that read it; the Cholesky solve sees just [pad, pad] +
        # [pad, d] donated operands, so its workspace never lands
        # beside the stack. Expert index is traced: 4 compiled programs
        # total regardless of E or depth.
        for l, r in zip(layers, ranks):
            ek = layer_params[l]["experts"]
            rank_t = jnp.asarray(r, dtype=jnp.int32)
            ridge_arr = jnp.asarray(config.nystrom_ridge, dt)
            cov_stack = calib.cov_mlp[l]
            ups_l, gates_l, downs_l, idxs_l, sel = [], [], [], [], []
            # Phase A — everything that reads the staged up/gate
            # kernels: select + row gathers per expert, rows leave HBM
            # (or are sliced) immediately.
            for e in range(E):
                e_t = jnp.asarray(e, dtype=jnp.int32)
                idx_e, valid_e = _select_stack_lowmem(
                    cov_stack, e_t, rank_t, pad_all, ridge_arr
                )
                np.asarray(idx_e[:1])  # retire the score workspace
                idx_r = np.asarray(idx_e[:r])
                if host_moe:
                    # rows gathered from host RAM — no device gather, no
                    # HBM->host transfer, bit-identical (exact upcast)
                    ups_l.append(_host_expert_rows(l, "up", e, idx_r))
                    gates_l.append(_host_expert_rows(l, "gate", e, idx_r))
                else:
                    up_e = _lowmem_rows(ek["up"]["kernel"][e], idx_e, valid_e)
                    gate_e = _lowmem_rows(ek["gate"]["kernel"][e], idx_e, valid_e)
                    if fetch == "device":
                        ups_l.append(up_e[:r].astype(fdt or up_e.dtype))
                        gates_l.append(gate_e[:r].astype(fdt or gate_e.dtype))
                    else:
                        ups_l.append(_fetch(up_e[:r], fdt))
                        gates_l.append(_fetch(gate_e[:r], fdt))
                    del up_e, gate_e
                idxs_l.append(idx_r)
                sel.append((idx_e, valid_e))
            # With the caller's consent (the streamed flush passes
            # scratch_params=True for its disposable staged tree), free
            # the up/gate expert stacks — 2/3 of the layer's MoE bytes,
            # 1.9 GB at Mixtral geometry — before any Cholesky arena
            # allocates. Only the routed-expert entries are touched
            # (shared experts + attention solve later from the same
            # window dict).
            if scratch_params:
                ek["up"] = {}
                ek["gate"] = {}
            # Phase B — down extract + solve per expert beside only the
            # tap stack and the staged down kernels.
            for e in range(E):
                e_t = jnp.asarray(e, dtype=jnp.int32)
                idx_e, valid_e = sel[e]
                C_SS, cross = _extract_down_operands(
                    cov_stack, e_t, ek["down"]["kernel"][e], idx_e, valid_e
                )
                np.asarray(C_SS[:1, :1])  # retire the gather temps
                down_e = _down_solve_lowmem(C_SS, cross, valid_e)
                np.asarray(down_e[:1, :1])
                del C_SS, cross
                if fetch == "device":
                    downs_l.append(down_e[:, :r].astype(fdt or down_e.dtype))
                else:
                    downs_l.append(_fetch(down_e[:, :r], fdt))
                del down_e
            sel.clear()
            stk = jnp.stack if fetch == "device" else np.stack
            out[l] = {
                "up": stk(ups_l), "gate": stk(gates_l), "down": stk(downs_l),
                "idx": np.stack(idxs_l),
            }
            logger.info(
                "[MLP-MoE] layer %d: %d experts compressed to rank %d (lowmem)",
                l, E, r,
            )
        if spec.shared_d_int and shared_ranks:
            shared = _solve_mlp_dense(
                spec, layer_params, layers, shared_ranks, calib, config, dt,
                use_dev, mesh, fetch, module="shared", pad_hint=shared_pad_hint,
                host_params=host_params,
            )
            for l in layers:
                out[l].update(shared[l])
        return out
    for s in range(0, len(layers), step):
        sub = layers[s : s + step]
        sub_ranks = ranks[s : s + step]
        for e0 in range(0, E, e_step):
            es = slice(e0, min(e0 + e_step, E))
            ne = es.stop - es.start
            if use_dev:
                # Drain the device queue before enqueuing the chunk's cov
                # slice: TPU buffers allocate at ENQUEUE time, and at
                # Mixtral geometry this [ne, d_int, d_int] copy must not
                # land while the window's forward/solve temps are live.
                np.asarray(calib.cov_mlp[sub[0]][(0,) * calib.cov_mlp[sub[0]].ndim])
                cov = jnp.stack([calib.cov_mlp[l][es] for l in sub]).astype(dt)
            else:
                # slice FIRST, then materialise: cov_mlp[l][es] is a view
                # for numpy accumulators and a chunk-sized fetch for
                # device ones — never the full [E, D, D] tensor per chunk
                cov = jnp.asarray(
                    np.stack([np.asarray(calib.cov_mlp[l][es]) for l in sub]), dtype=dt
                )
            cov = cov.reshape((len(sub) * ne,) + cov.shape[2:])
            W_u = stack_e(sub, "up", es)
            W_g = stack_e(sub, "gate", es)
            W_d = stack_e(sub, "down", es)
            ranks_arr = jnp.asarray(np.repeat(sub_ranks, ne), dtype=jnp.int32)

            (cov, W_u, W_g, W_d), ranks_arr, n_real = _shard_layers(
                (cov, W_u, W_g, W_d), ranks_arr, mesh
            )
            # Two-phase split (ops/mlp.py): the score pass's
            # Cholesky-inverse workspace (~2x[D,D] — 1.6 GB at Mixtral
            # geometry) retires before the factor pass allocates its
            # [pad,D] gathers, and the donated chunk copies (cov 822 MB +
            # three 235 MB weight stacks per expert) are freed into the
            # factor program's arena. The monolithic nystrom_mlp_padded
            # held all of it live at once and RESOURCE_EXHAUSTED the
            # moe8 flush next to the resident [E,D,D] tap stack.
            idx, valid = _select_padded_batched(
                cov, ranks_arr, pad_all, jnp.asarray(config.nystrom_ridge, dt)
            )
            up, gate, down = _factor_padded_batched(cov, W_u, W_g, W_d, idx, valid)

            if fetch == "device":
                idx_dev = np.asarray(idx)
                for i, l in enumerate(sub):
                    r = sub_ranks[i]
                    sl = slice(i * ne, (i + 1) * ne)
                    p = pieces.setdefault(l, {"up": [], "gate": [], "down": [], "idx": []})
                    p["up"].append(up[sl, :r].astype(fdt or up.dtype))
                    p["gate"].append(gate[sl, :r].astype(fdt or gate.dtype))
                    p["down"].append(down[sl, :, :r].astype(fdt or down.dtype))
                    p["idx"].append(idx_dev[sl, :r])
                continue

            # Drain the solve queue before enqueuing the slice/concat
            # buffers (same hazard as _fetch_ragged: at beyond-HBM MoE
            # geometry the concat allocations would otherwise overlap
            # the live solve program's temp arena at enqueue time).
            np.asarray(up[(0,) * up.ndim])

            # One ragged transfer per factor kind across (layer, expert) pairs.
            def cat_rows(stack):  # [n*ne, pad, d] -> exact [sum ne*r, d], one fetch
                parts = [
                    stack[i * ne : (i + 1) * ne, : sub_ranks[i]].reshape(
                        ne * sub_ranks[i], -1
                    )
                    for i in range(len(sub))
                ]
                return jnp.concatenate(parts, axis=0)

            down_h = _fetch(cat_rows(jnp.swapaxes(down, 1, 2)), fdt)  # [ne*r, d]
            idx_h = np.asarray(
                jnp.concatenate(
                    [
                        idx[i * ne : (i + 1) * ne, : sub_ranks[i]].reshape(-1)
                        for i in range(len(sub))
                    ]
                )
            )
            if not host_moe:
                up_h = _fetch(cat_rows(up), fdt)
                gate_h = _fetch(cat_rows(gate), fdt)
            off = 0
            for i, l in enumerate(sub):
                r = sub_ranks[i]
                sl = slice(off, off + ne * r)
                p = pieces.setdefault(l, {"up": [], "gate": [], "down": [], "idx": []})
                idx_le = idx_h[off : off + ne * r].reshape(ne, r)
                if host_moe:
                    p["up"].append(np.stack([
                        _host_expert_rows(l, "up", es.start + e, idx_le[e])
                        for e in range(ne)
                    ]))
                    p["gate"].append(np.stack([
                        _host_expert_rows(l, "gate", es.start + e, idx_le[e])
                        for e in range(ne)
                    ]))
                else:
                    p["up"].append(up_h[sl].reshape(ne, r, -1))
                    p["gate"].append(gate_h[sl].reshape(ne, r, -1))
                p["down"].append(np.swapaxes(down_h[sl].reshape(ne, r, -1), 1, 2))
                p["idx"].append(idx_le)
                off += ne * r

    cat = jnp.concatenate if fetch == "device" else np.concatenate
    for l, p in pieces.items():
        idx_parts = p.pop("idx")  # host np on both fetch modes
        out[l] = {k: (v[0] if len(v) == 1 else cat(v, axis=0)) for k, v in p.items()}
        out[l]["idx"] = (
            idx_parts[0] if len(idx_parts) == 1 else np.concatenate(idx_parts, axis=0)
        )
        logger.info(
            "[MLP-MoE] layer %d: %d experts compressed to rank %d",
            l, E, ranks[layers.index(l)],
        )

    if spec.shared_d_int and shared_ranks:
        # Shared experts across these MoE layers: one more batched dense
        # Type-I program at the shared intermediate's own ranks.
        shared = _solve_mlp_dense(
            spec, layer_params, layers, shared_ranks, calib, config, dt, use_dev, mesh,
            fetch, module="shared", pad_hint=shared_pad_hint,
            host_params=host_params,
        )
        for l in layers:
            out[l].update(shared[l])
    return out


def _solve_mlp_batched(
    spec, layer_params, layers, ranks, calib, config, dt, use_dev, mesh=None, fetch="host",
    shared_ranks=None, pad_hint=0, shared_pad_hint=0, scratch_params=False,
    host_params=None,
) -> Dict[int, Dict]:
    if spec.n_experts:
        # mixed qwen3_moe stacks: solve the MoE and dense layer subsets
        # through their own batched programs
        moe = [(l, r) for l, r in zip(layers, ranks) if spec.is_moe_layer(l)]
        dense = [(l, r) for l, r in zip(layers, ranks) if not spec.is_moe_layer(l)]
        sr_by_layer = dict(zip(layers, shared_ranks)) if shared_ranks else {}
        out: Dict[int, Dict] = {}
        if moe:
            out.update(
                _solve_mlp_moe(
                    spec, layer_params, [l for l, _ in moe], [r for _, r in moe],
                    calib, config, dt, use_dev, mesh, fetch,
                    shared_ranks=[sr_by_layer[l] for l, _ in moe] if sr_by_layer else None,
                    pad_hint=pad_hint, shared_pad_hint=shared_pad_hint,
                    scratch_params=scratch_params, host_params=host_params,
                )
            )
        if dense:
            out.update(
                _solve_mlp_dense(
                    spec, layer_params, [l for l, _ in dense], [r for _, r in dense],
                    calib, config, dt, use_dev, mesh, fetch, pad_hint=pad_hint,
                    host_params=host_params,
                )
            )
        return out
    return _solve_mlp_dense(
        spec, layer_params, layers, ranks, calib, config, dt, use_dev, mesh, fetch,
        pad_hint=pad_hint, host_params=host_params,
    )


def _solve_mlp_dense(
    spec, layer_params, layers, ranks, calib, config, dt, use_dev, mesh=None, fetch="host",
    module=None, pad_hint=0, host_params=None,
) -> Dict[int, Dict]:
    """module=None: the layer's own MLP (cov_mlp). module="shared": the
    DeepSeek/qwen2_moe shared expert (lp["shared"], cov_shared, always
    gated, bias-free) — same padded Nystrom program, "shared_"-prefixed
    factor keys.

    ``host_params`` (per-layer HOST numpy trees) turns on host-side
    factor reconstruction: the Type-I up/gate factors are pure ROW
    SLICES of the dense kernels (reference: compress_mlp.py:49-50), so
    when the host already holds those kernels (beyond-HBM staged sweeps,
    host-resident chunked runs) only the selection ``idx`` and the
    re-solved ``down`` cross the HBM->host link — the up/gate slices are
    gathered from host memory, bit-identical to the device gather
    (bf16 -> f32 -> bf16 round-trips exactly). On the serialised
    ~33 MB/s tunnel D2H link this deletes ~2/3 of the factor drain."""
    shared = module == "shared"
    sub_params = (
        layer_params if not shared else {l: layer_params[l]["shared"] for l in layers}
    )
    host_sub = None
    if fetch == "host" and host_params is not None and all(l in host_params for l in layers):
        host_sub = (
            host_params if not shared
            else {l: host_params[l]["shared"] for l in layers}
        )
    covs = calib.cov_shared if shared else calib.cov_mlp
    gated = True if shared else spec.gated_mlp
    prefix = "shared_" if shared else ""
    fdt = _fetch_dtype(config)
    pad_all = int(max([*ranks, pad_hint]))
    step = _mlp_layers_per_program(
        spec, pad_all, mesh, d_int=spec.shared_d_int if shared else 0
    )
    out = {}
    for s in range(0, len(layers), step):
        sub = layers[s : s + step]
        sub_ranks = ranks[s : s + step]
        ranks_arr = jnp.asarray(sub_ranks, dtype=jnp.int32)
        ridge_arr = jnp.asarray(config.nystrom_ridge, dt)
        d_cov = np.asarray(covs[sub[0]]).shape[-1] if not isinstance(
            covs[sub[0]], jax.Array) else covs[sub[0]].shape[-1]
        # Coarse-grid uniform pad: per-window calls (the streamed path
        # flushes 1-layer windows) and 1-layer lowmem chunks otherwise
        # compile one solve program PER DISTINCT RANK (32 compiles at
        # 7B — an hour through a remote-compile tunnel).
        pad = _grid_pad(pad_all, d_cov)
        if d_cov ** 2 * jnp.dtype(dt).itemsize > _LOWMEM_COV_BYTES:
            # Low-memory sequencing for very large d_int (7B+): with the
            # full model resident there is only ~3 GB of HBM left, so the
            # solve runs per layer as THREE drained programs — selection
            # (its Cholesky-inverse workspace alone is ~2x[D,D]), the
            # down re-solve, and the up/gate row gathers — each reading
            # the resident bf16 kernels directly (bf16 -> f32 upcast is
            # exact, so numerics match the stacked-f32 path bit for bit)
            # instead of staging f32 weight copies. ~75 ms of extra
            # tunnel syncs per layer; irrelevant at this scale.
            from modegpt_tpu.ops.mlp import nystrom_select_padded

            ups_l, gates_l, downs_l, idxs_l, valids_l = [], [], [], [], []
            for i, l in enumerate(sub):
                # consume the calibration covariance IN PLACE (astype to
                # the solver dtype is a no-op for device f32) — a stacked
                # copy would double the [D,D] residency
                C_l = (
                    covs[l].astype(dt) if isinstance(covs[l], jax.Array)
                    else jnp.asarray(np.asarray(covs[l]), dtype=dt)
                )
                idx_i, valid_i = nystrom_select_padded(
                    C_l, ranks_arr[i], pad, ridge_arr
                )
                np.asarray(idx_i[:1])  # retire the score workspace
                down_i = _lowmem_down(
                    C_l, sub_params[l]["down"]["kernel"], idx_i, valid_i
                )
                np.asarray(down_i[:1, :1])
                if host_sub is None:
                    up_i = _lowmem_rows(sub_params[l]["up"]["kernel"], idx_i, valid_i)
                    gate_i = (
                        _lowmem_rows(sub_params[l]["gate"]["kernel"], idx_i, valid_i)
                        if gated else up_i
                    )
                    ups_l.append(up_i)
                    gates_l.append(gate_i)
                downs_l.append(down_i)
                idxs_l.append(idx_i)
                valids_l.append(valid_i)
            down = jnp.stack(downs_l)
            idx, valid = jnp.stack(idxs_l), jnp.stack(valids_l)
            if host_sub is None:
                up, gate = jnp.stack(ups_l), jnp.stack(gates_l)
            else:
                up = gate = None  # host-reconstructed below
        else:
            cov = _stack_covs(covs, sub, dt, use_dev)
            W_u = _stack_w(sub_params, sub, "up", dt, use_dev)
            W_d = _stack_w(sub_params, sub, "down", dt, use_dev)
            if gated:
                W_g = _stack_w(sub_params, sub, "gate", dt, use_dev)
            else:
                W_g = W_u  # placeholder; gate output discarded
            (cov, W_u, W_g, W_d), ranks_arr, n_real = _shard_layers(
                (cov, W_u, W_g, W_d), ranks_arr, mesh
            )
            up, gate, down, idx, valid = jax.vmap(
                nystrom_mlp_padded, in_axes=(0, 0, 0, 0, 0, None, None)
            )(cov, W_u, W_g, W_d, ranks_arr, pad, ridge_arr)

        if fetch == "device":
            # Factors stay on device (exact slices); the surgery consumes
            # them without any HBM->host round-trip. idx comes to the host
            # in one small transfer (needed for OPT bias selection).
            idx_h = np.asarray(idx)
            ups = [up[i, :r].astype(fdt or up.dtype) for i, r in enumerate(sub_ranks)]
            downs = [down[i, :, :r].astype(fdt or down.dtype) for i, r in enumerate(sub_ranks)]
            idxs = [idx_h[i, :r] for i, r in enumerate(sub_ranks)]
            gates = (
                [gate[i, :r].astype(fdt or gate.dtype) for i, r in enumerate(sub_ranks)]
                if gated
                else None
            )
        else:
            # One ragged transfer per factor kind (exact bytes, single fetch).
            downs = _fetch_ragged(down, sub_ranks, fdt, axis=1)
            idxs = _fetch_ragged(idx, sub_ranks, None, axis=0)
            if host_sub is None:
                ups = _fetch_ragged(up, sub_ranks, fdt, axis=0)
                gates = _fetch_ragged(gate, sub_ranks, fdt, axis=0) if gated else None
            else:
                # Up/gate are row slices of kernels the HOST already
                # holds: gather there, skip their HBM->host transfer
                # entirely (bit-identical — see docstring). fdt=None
                # (float32 model) targets f32, NOT the solver dtype dt:
                # under solver_precision='f64_cpu' the device-fetch
                # lowmem path yields f32 factors (_lowmem_rows upcast),
                # and host-gathered factors must match that dtype.
                tgt = fdt if fdt is not None else np.float32
                ups = [
                    _hf_w(host_sub[l], "up")[idxs[i]].astype(tgt, copy=False)
                    for i, l in enumerate(sub)
                ]
                gates = (
                    [
                        _hf_w(host_sub[l], "gate")[idxs[i]].astype(tgt, copy=False)
                        for i, l in enumerate(sub)
                    ]
                    if gated
                    else None
                )
        for i, l in enumerate(sub):
            f = {prefix + "up": ups[i], prefix + "down": downs[i], prefix + "idx": idxs[i]}
            bias_src = host_sub[l] if host_sub is not None else layer_params[l]
            if gated:
                f[prefix + "gate"] = gates[i]
            elif "bias" in bias_src["up"]:
                f["up_bias"] = np.asarray(bias_src["up"]["bias"])[f["idx"]]
                f["down_bias"] = np.asarray(bias_src["down"]["bias"])
            out[l] = f
            logger.info(
                "[MLP%s] layer %d compressed to rank %d",
                "-shared" if shared else "", l, sub_ranks[i],
            )
    return out


def _solve_qk_host(
    spec, layer_params, layers, ranks, calib, config, use_dev: bool = False, fetch="host",
    host_params=None,
) -> Dict[int, Dict]:
    """QK selection on the host: scores are covariance diagonals (exactly
    the reference's sqrt-column-norms, see ops/qk.py). Row gathers run on
    the device when stats live there, so only the KEPT rows cross the
    HBM->host link — and when the HOST already holds the dense kernels
    (``host_params``: beyond-HBM staged sweeps, host-resident chunked
    runs) the kept rows are gathered from host memory instead, so
    NOTHING crosses the link: Type-II factors are pure row slices of
    W_q/W_k by the selection mask (reference: compress_qk.py:369-380)."""
    H, Hk, hd = spec.n_heads, spec.n_kv_heads, spec.head_dim
    if not (fetch == "host" and host_params is not None
            and all(l in host_params for l in layers)):
        host_params = None
    group = H // Hk
    half = hd // 2

    fdt = _fetch_dtype(config)

    # Covariance diagonals for ALL layers in one transfer each (the
    # device path's per-layer fetches are latency-bound on tunneled hosts).
    if use_dev and isinstance(next(iter(calib.cov_q.values())), jax.Array):
        dq_all = np.asarray(
            jnp.diagonal(jnp.stack([calib.cov_q[l] for l in layers]), axis1=-2, axis2=-1),
            dtype=np.float64,
        )
        dk_all = np.asarray(
            jnp.diagonal(jnp.stack([calib.cov_k[l] for l in layers]), axis1=-2, axis2=-1),
            dtype=np.float64,
        )
    else:
        dq_all = np.stack([_diag_host(calib.cov_q[l]) for l in layers])
        dk_all = np.stack([_diag_host(calib.cov_k[l]) for l in layers])

    # Selection masks per layer on the host (scores are diagonal math).
    masks_by_layer = []
    for i, l in enumerate(layers):
        r = ranks[i]
        dq, dk = dq_all[i], dk_all[i]
        if spec.uses_rope:
            eq = (dq + DEFAULT_SQRT_RIDGE).reshape(Hk, group, hd)
            ek = dk + config.ridge_qk
            pair = (eq[..., :half] * ek[:, None, :half] + eq[..., half:] * ek[:, None, half:])
            scores = np.sqrt(pair.sum(axis=1))  # [Hk, half]
            masks = np.stack(
                [np.concatenate([t := _topk_desc(scores[kv], r // 2), t + half]) for kv in range(Hk)]
            )
        else:
            scores = np.sqrt(dq + DEFAULT_SQRT_RIDGE) * np.sqrt(dk + DEFAULT_SQRT_RIDGE)
            masks = np.stack([_topk_desc(scores[h], r) for h in range(H)])
        masks_by_layer.append(masks)

    def gather_all(name, n_h, masks_list):
        """Per-head row gathers for every layer, ONE ragged host transfer
        on the device path (gathers are memory moves; only kept rows cross
        the HBM->host link, concatenated into a single fetch)."""
        if use_dev and host_params is None:
            if fetch == "device":
                parts = []
                for i, l in enumerate(layers):
                    w = _hf_w_dev(layer_params[l], name).reshape(n_h, hd, -1)
                    sel = jnp.take_along_axis(
                        w, jnp.asarray(masks_list[i])[:, :, None], axis=1
                    )
                    parts.append(sel.reshape(-1, sel.shape[-1]))
                return [p.astype(fdt or p.dtype) for p in parts]
            # Host-fetch path: pad every mask to a common 32-grid width so
            # the gather/concat programs have ONE shape signature per
            # window instead of one per distinct rank (remote backends
            # pay an AOT round trip per signature); trim exactly on host.
            rpad = min(hd, -(-max(m.shape[1] for m in masks_list) // 32) * 32)
            parts = []
            for i, l in enumerate(layers):
                m = masks_list[i]
                mp = np.concatenate(
                    [m, np.zeros((n_h, rpad - m.shape[1]), dtype=m.dtype)], axis=1
                )
                w = _hf_w_dev(layer_params[l], name).reshape(n_h, hd, -1)
                sel = jnp.take_along_axis(w, jnp.asarray(mp)[:, :, None], axis=1)
                parts.append(sel.reshape(-1, sel.shape[-1]))
            flat = _fetch(jnp.concatenate(parts, axis=0), fdt)
            out_rows = []
            for i, m in enumerate(masks_list):
                blk = flat[i * n_h * rpad : (i + 1) * n_h * rpad]
                blk = blk.reshape(n_h, rpad, -1)[:, : m.shape[1]]
                out_rows.append(blk.reshape(n_h * m.shape[1], -1))
            return out_rows
        rows = []
        src = host_params if host_params is not None else layer_params
        for i, l in enumerate(layers):
            w = _hf_w(src[l], name).reshape(n_h, hd, -1)
            m = masks_list[i]
            rows.append(np.concatenate([w[h][m[h]] for h in range(n_h)], axis=0))
        return rows

    if spec.uses_rope:
        q_rows = gather_all("q", H, [np.repeat(m, group, axis=0) for m in masks_by_layer])
        k_rows = gather_all("k", Hk, masks_by_layer)
    else:
        q_rows = gather_all("q", H, masks_by_layer)
        k_rows = gather_all("k", H, masks_by_layer)

    out = {}
    for i, l in enumerate(layers):
        masks = masks_by_layer[i]
        lp_b = host_params[l] if host_params is not None else layer_params[l]
        if spec.uses_rope:
            out[l] = {"q": q_rows[i], "k": k_rows[i], "rotary_mask": masks.astype(np.int32)}
            if "bias" in lp_b["q"]:
                # RoPE archs with qkv biases (qwen2_moe): bias entries are
                # per-output-coordinate, so slice them through the same
                # per-head frequency mask as the kernel rows.
                bq = np.asarray(lp_b["q"]["bias"]).reshape(H, hd)
                bk = np.asarray(lp_b["k"]["bias"]).reshape(Hk, hd)
                mq = np.repeat(masks, group, axis=0)
                out[l]["q_bias"] = np.concatenate([bq[h][mq[h]] for h in range(H)])
                out[l]["k_bias"] = np.concatenate([bk[h][masks[h]] for h in range(Hk)])
        else:
            bq = np.asarray(lp_b["q"]["bias"]).reshape(H, hd)
            bk = np.asarray(lp_b["k"]["bias"]).reshape(H, hd)
            out[l] = {
                "q": q_rows[i],
                "k": k_rows[i],
                "q_bias": np.concatenate([bq[h][masks[h]] for h in range(H)]),
                "k_bias": np.concatenate([bk[h][masks[h]] for h in range(H)]),
            }
        logger.info("[QK] layer %d compressed to rank %d per head", l, ranks[i])
    return out


def _solve_qk_svd_batched(
    spec, layer_params, layers, ranks, calib, config, dt, use_dev
) -> Dict[int, Dict]:
    """Whitened-SVD QK (qk_method='svd', non-RoPE archs)."""
    from modegpt_tpu.ops.qk import compress_qk_layer_svd

    out = {}
    for i, l in enumerate(layers):
        lp = layer_params[l]
        cov = calib.cov_x[l]
        cov = jnp.asarray(cov if use_dev and isinstance(cov, jax.Array) else np.asarray(cov), dtype=dt)
        W_q = (_hf_w_dev(lp, "q") if use_dev else jnp.asarray(_hf_w(lp, "q"))).astype(dt)
        W_k = (_hf_w_dev(lp, "k") if use_dev else jnp.asarray(_hf_w(lp, "k"))).astype(dt)
        bq = jnp.asarray(np.asarray(lp["q"]["bias"]), dtype=dt) if "bias" in lp["q"] else None
        bk = jnp.asarray(np.asarray(lp["k"]["bias"]), dtype=dt) if "bias" in lp["k"] else None
        f = compress_qk_layer_svd(cov, W_q, W_k, bq, bk, ranks[i], config.ridge_qk, spec.n_heads)
        fd = {"q": np.asarray(f.q), "k": np.asarray(f.k)}
        if f.q_bias is not None:
            fd["q_bias"] = np.asarray(f.q_bias)
            fd["k_bias"] = np.asarray(f.k_bias)
        out[l] = fd
        logger.info("[QK-SVD] layer %d compressed to rank %d per head", l, ranks[i])
    return out


def _solve_vo_batched(
    spec, layer_params, layers, ranks, calib, config, dt, whiten, use_dev, mesh=None,
    fetch="host",
) -> Dict[int, Dict]:
    cov = _stack_covs(calib.cov_x, layers, dt, use_dev)
    W_v = _stack_w(layer_params, layers, "v", dt, use_dev)
    W_o = _stack_w(layer_params, layers, "o", dt, use_dev)

    (cov, W_v, W_o), _, n_real = _shard_layers(
        (cov, W_v, W_o), jnp.zeros(cov.shape[0], jnp.int32), mesh
    )
    v_full, o_full = jax.vmap(
        vo_full_factors, in_axes=(0, 0, 0, None, None, None, None)
    )(cov, W_v, W_o, spec.n_heads, spec.n_kv_heads, config.ridge_vo, whiten)
    # Slice to the chunk's max rank on-device before fetching — rounded
    # to a 32-grid so per-window calls share one program signature
    # (exact trim happens host-side in vo_factors_from_full).
    fdt = _fetch_dtype(config)
    max_r = min(v_full.shape[-1], -(-int(max(ranks)) // 32) * 32)
    if fetch == "device":
        v_full = v_full[:n_real, :, :, :max_r].astype(fdt or v_full.dtype)
        o_full = o_full[:n_real, :, :max_r, :].astype(fdt or o_full.dtype)
    else:
        v_full = _fetch(v_full[:n_real, :, :, :max_r], fdt)
        o_full = _fetch(o_full[:n_real, :, :max_r, :], fdt)

    out = {}
    for i, l in enumerate(layers):
        r = ranks[i]
        # numpy in, numpy out — vo_factors_from_full is pure slicing/reshape.
        f = vo_factors_from_full(v_full[i], o_full[i], r, spec.n_heads, spec.n_kv_heads)
        if fetch == "device":
            fd = {"v": f.v, "o": f.o}
        else:
            fd = {"v": np.asarray(f.v), "o": np.asarray(f.o)}
        if "bias" in layer_params[l].get("v", {}):
            b_v = np.asarray(layer_params[l]["v"]["bias"], dtype=np.float64)
            # GQA: each kv head's v bias feeds group_size query heads, so
            # repeat it per group before folding through W_o (exact — the
            # attention weights sum to 1 per head).
            if spec.n_kv_heads != spec.n_heads:
                hd_v = b_v.shape[0] // spec.n_kv_heads
                b_v = np.repeat(
                    b_v.reshape(spec.n_kv_heads, hd_v), spec.group_size, axis=0
                ).reshape(-1)
            W_o_np = np.asarray(_hf_w(layer_params[l], "o"), dtype=np.float64)
            b_o = np.asarray(
                layer_params[l]["o"].get("bias", np.zeros(spec.d_model)), dtype=np.float64
            )
            fd["o_bias"] = b_o + W_o_np @ b_v
        out[l] = fd
        logger.info("[VO] layer %d compressed to rank %d per head", l, r)
    return out


def solve_chunk_batched(
    spec: ModelSpec,
    params: Dict,
    target_layers: Sequence[int],
    keep_ratios: List[float],
    calib: CalibrationResult,
    config: CompressionConfig,
    order: str,
    mesh=None,
    fetch: str = "host",
    scratch_params: bool = False,
    host_params=None,
) -> Dict[str, Dict[int, Dict]]:
    """Solve a whole layer chunk with one device program per suffix.

    fetch="host" returns numpy factors (one ragged HBM->host transfer per
    factor kind — what the factor store needs); fetch="device" keeps the
    factors as exact device slices for zero-copy surgery (in-memory
    compress-then-serve jobs never pay the host link at all).
    scratch_params=True lets memory-tight solvers consume ``params``
    leaves that their own factors make dead (the streamed flush passes
    its disposable staged tree); the default never mutates the caller's
    tree.

    ``host_params`` (optional per-layer HOST numpy trees, keyed like
    ``params["layers"]``) enables host-side reconstruction of the
    selection-type factors: Type-I up/gate and Type-II q/k are pure row
    slices of the dense kernels, so layers whose kernels the host
    already holds gather them from host memory and skip their HBM->host
    transfer (bit-identical; only idx/down/vo cross the link). When
    omitted, layers whose ``params`` leaves are already host numpy are
    detected automatically — the streamed beyond-HBM flush passes its
    original host tree explicitly because the solver only sees the
    staged device window.
    """
    layers = list(target_layers)
    layer_params = {l: params["layers"][l] for l in layers}
    if host_params is None and fetch == "host":
        host_params = {}
        for l in layers:
            leaves = jax.tree_util.tree_leaves(layer_params[l])
            if leaves and not isinstance(leaves[0], jax.Array):
                host_params[l] = layer_params[l]
        host_params = host_params or None
    dt = solver_dtype(config.solver_precision)
    use_dev = config.solver_precision == "f32_device"
    whiten = "eigh" if config.solver_precision == "f64_cpu" else "cholesky"

    out: Dict[str, Dict[int, Dict]] = {}
    with solver_placement(config.solver_precision):
        if config.debug:
            # Covariance conditioning diagnostics (reference: sqrt_M's
            # debug prints, compression_utils.py:28-45).
            from modegpt_tpu.ops.psd import psd_diagnostics

            for l in layers[:2]:
                if "mlp" in order:
                    d = psd_diagnostics(jnp.asarray(np.asarray(calib.cov_mlp[l]), dtype=dt),
                                        config.nystrom_ridge)
                    logger.info("[debug] layer %d cov_mlp: %s", l, d)
                if "vo" in order:
                    d = psd_diagnostics(jnp.asarray(np.asarray(calib.cov_x[l]), dtype=dt),
                                        config.ridge_vo)
                    logger.info("[debug] layer %d cov_x: %s", l, d)
        if "mlp" in order:
            ranks = [compress_ranks_for_layer(spec, keep_ratios[l], "mlp") for l in layers]
            shared_ranks = (
                [compress_ranks_for_layer(spec, keep_ratios[l], "shared") for l in layers]
                if spec.shared_d_int
                else None
            )
            out["mlp"] = _solve_mlp_batched(
                spec, layer_params, layers, ranks, calib, config, dt, use_dev, mesh, fetch,
                scratch_params=scratch_params, host_params=host_params,
                shared_ranks=shared_ranks,
                pad_hint=_global_rank_hint(spec, keep_ratios, "mlp"),
                shared_pad_hint=(
                    _global_rank_hint(spec, keep_ratios, "shared")
                    if spec.shared_d_int else 0
                ),
            )
        if "qk" in order:
            ranks = [compress_ranks_for_layer(spec, keep_ratios[l], "qk") for l in layers]
            if config.qk_method == "svd" and not spec.uses_rope:
                out["qk"] = _solve_qk_svd_batched(
                    spec, layer_params, layers, ranks, calib, config, dt, use_dev
                )
            else:
                out["qk"] = _solve_qk_host(
                    spec, layer_params, layers, ranks, calib, config, use_dev, fetch,
                    host_params=host_params,
                )
        if "vo" in order:
            ranks = [compress_ranks_for_layer(spec, keep_ratios[l], "vo") for l in layers]
            out["vo"] = _solve_vo_batched(
                spec, layer_params, layers, ranks, calib, config, dt, whiten, use_dev, mesh,
                fetch,
            )
    return out
