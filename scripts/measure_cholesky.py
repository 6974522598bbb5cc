"""Native-vs-recursive Cholesky/solve A/B at solver dims on the TPU.

Sets/validates ops/psd.py's _CHOL_RECURSIVE_MIN_N threshold with
measurements instead of theory: times jnp.linalg.cholesky vs
_cholesky_recursive (and the full ridge_inverse_diag selection score
both ways) at the d_int sizes the solvers actually factor
(7B: 11008, 13B: 13824, Mixtral expert: 14336, VO whiten: 4096/5120),
and reports compile seconds for each program — the recursion trades one
big native lowering for ~n/leaf small ones, which matters through a
remote-compile tunnel.

Usage: python scripts/measure_cholesky.py [n ...]   (default sweep)
Prints ONE JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modegpt_tpu.utils.backend import ensure_available_backend

ensure_available_backend()

import jax
import jax.numpy as jnp
import numpy as np

from modegpt_tpu.ops import psd

SIZES = [int(a) for a in sys.argv[1:]] or [4096, 5120, 11008, 13824, 14336]


def timed(fn, arg, reps=3, tag=""):
    t0 = time.perf_counter()
    out = fn(arg)
    np.asarray(out.reshape(-1)[:1])
    compile_s = time.perf_counter() - t0
    print(f"    [{tag}] first call (compile+run): {compile_s:.1f}s",
          file=sys.stderr, flush=True)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(arg)
        np.asarray(out.reshape(-1)[:1])
        times.append(time.perf_counter() - t0)
    t = sorted(times)[len(times) // 2]
    print(f"    [{tag}] warm: {t:.3f}s", file=sys.stderr, flush=True)
    return t, compile_s


def main():
    rows = []
    for n in SIZES:
        # PSD matrix built ON DEVICE (staging an [n, n] f32 over the
        # tunnel would dominate the session)
        def _mk(k):
            g = jax.random.normal(k, (n, n), jnp.float32)
            return g @ g.T / n + jnp.eye(n, dtype=jnp.float32)

        C = jax.jit(_mk)(jax.random.key(0))
        np.asarray(C.reshape(-1)[:1])

        native = jax.jit(jnp.linalg.cholesky)
        recur = jax.jit(psd._cholesky_recursive)
        t_nat, c_nat = timed(native, C, tag=f"native n={n}")
        t_rec, c_rec = timed(recur, C, tag=f"recursive n={n}")
        row = {
            "n": n,
            "native_s": round(t_nat, 3), "native_compile_s": round(c_nat, 1),
            "recursive_s": round(t_rec, 3), "recursive_compile_s": round(c_rec, 1),
            "speedup": round(t_nat / t_rec, 2),
        }
        # full selection score both ways (what solve_mlp actually runs)
        if n >= 8192:
            os.environ["MODEGPT_CHOL_RECURSIVE"] = "0"
            inv_nat = jax.jit(lambda c: psd.ridge_inverse_diag.__wrapped__(c, 1e-2))
            t, c = timed(inv_nat, C, tag=f"invdiag-native n={n}")
            row["invdiag_native_s"], row["invdiag_native_compile_s"] = round(t, 3), round(c, 1)
            os.environ["MODEGPT_CHOL_RECURSIVE"] = "1"
            inv_rec = jax.jit(lambda c: psd.ridge_inverse_diag.__wrapped__(c, 1e-2))
            t, c = timed(inv_rec, C, tag=f"invdiag-recursive n={n}")
            row["invdiag_recursive_s"], row["invdiag_recursive_compile_s"] = round(t, 3), round(c, 1)
            row["invdiag_speedup"] = round(
                row["invdiag_native_s"] / row["invdiag_recursive_s"], 2
            )
        rows.append(row)
        print(f"  n={n}: {row}", file=sys.stderr, flush=True)
        del C
    print(json.dumps({
        "device_kind": str(jax.devices()[0].device_kind),
        "leaf": psd._CHOL_LEAF,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
