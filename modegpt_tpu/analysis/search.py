"""Hyperparameter search for compression knobs.

Parity with the reference's optuna harness (reference:
src/analysis/optuna.py — sqlite-backed study minimizing compressed PPL
over nystrom_ridge / sparsity_smoothing / ridge_vo / ridge_qk). Optuna
is not available in every environment, so this module provides:

* `objective(trial, base_config, ...)` — an optuna-compatible objective
  with the reference's search space (optuna.py:16-31);
* `run_optuna_study(...)` — the full study, gated on optuna import;
* `random_search(...)` — a dependency-free fallback sampler over the
  same space (log-uniform), useful offline.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import random
from typing import Callable, Dict, List, Optional, Tuple

from modegpt_tpu.config import CompressionConfig

logger = logging.getLogger("modegpt_tpu")

__all__ = ["SEARCH_SPACE", "objective", "run_optuna_study", "random_search"]

# The reference's search space (src/analysis/optuna.py:17-24).
SEARCH_SPACE = {
    "nystrom_ridge": (1e-6, 1e-1, "log"),
    "sparsity_smoothing": (1e-3, 0.3, "log"),
    "ridge_vo": (1e-7, 1e-2, "log"),
    "ridge_qk": (1e-7, 1e-1, "log"),
}


def _apply_params(base_config: CompressionConfig, params: Dict) -> CompressionConfig:
    return dataclasses.replace(base_config, **params)


def objective(trial, base_config: CompressionConfig, run_fn: Optional[Callable] = None):
    """Optuna objective: minimize compressed PPL (reference: optuna.py:9-35)."""
    params = {
        name: trial.suggest_float(name, lo, hi, log=(scale == "log"))
        for name, (lo, hi, scale) in SEARCH_SPACE.items()
    }
    config = _apply_params(base_config, params)
    if run_fn is None:
        from modegpt_tpu.compress.pipeline import run_compression

        run_fn = lambda cfg: run_compression(cfg)["compressed_ppl"]
    return run_fn(config)


def run_optuna_study(
    base_config: CompressionConfig,
    n_trials: int = 20,
    storage: str = "sqlite:///optuna_modegpt.db",
    study_name: str = "modegpt_tpu",
    run_fn: Optional[Callable] = None,
):
    """Reference-parity study (sqlite storage, minimize)."""
    try:
        import optuna
    except ImportError as e:
        raise ImportError(
            "optuna is not installed in this environment; use "
            "modegpt_tpu.analysis.search.random_search instead"
        ) from e

    study = optuna.create_study(
        study_name=study_name, storage=storage, direction="minimize", load_if_exists=True
    )
    study.optimize(lambda t: objective(t, base_config, run_fn), n_trials=n_trials)
    logger.info("best params: %s (ppl %.4f)", study.best_params, study.best_value)
    return study


def random_search(
    base_config: CompressionConfig,
    run_fn: Callable[[CompressionConfig], float],
    n_trials: int = 20,
    seed: int = 1234,
) -> Tuple[Dict, float, List[Tuple[Dict, float]]]:
    """Dependency-free log-uniform random search over the same space."""
    rng = random.Random(seed)
    history: List[Tuple[Dict, float]] = []
    best: Optional[Tuple[Dict, float]] = None
    for i in range(n_trials):
        params = {}
        for name, (lo, hi, scale) in SEARCH_SPACE.items():
            if scale == "log":
                params[name] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
            else:
                params[name] = rng.uniform(lo, hi)
        value = run_fn(_apply_params(base_config, params))
        history.append((params, value))
        if best is None or value < best[1]:
            best = (params, value)
        logger.info("trial %d/%d: %.4f (best %.4f)", i + 1, n_trials, value, best[1])
    return best[0], best[1], history
