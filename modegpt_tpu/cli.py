"""Command-line entry point: ``python -m modegpt_tpu.cli [flags]``.

Mirrors the reference CLI (reference: ``python -m src.run_modegpt``,
README.md:32) with the same knob names via the reflection-generated
parser (modegpt_tpu/config.py).
"""

from __future__ import annotations

import logging


def main(argv=None):
    from modegpt_tpu.config import CompressionConfig
    from modegpt_tpu.utils.logging import setup_logging
    from modegpt_tpu.utils.precision import enable_x64

    from modegpt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = CompressionConfig.from_args(argv)
    logger = setup_logging(level=logging.DEBUG if config.debug else logging.INFO)
    if config.solver_precision == "f64_cpu":
        enable_x64()

    from modegpt_tpu.compress.pipeline import run_compression
    from modegpt_tpu.parallel.mesh import make_mesh, maybe_initialize_distributed
    from modegpt_tpu.utils.memory import start_memory_watchdog

    # distributed init MUST precede anything that touches jax devices —
    # the watchdog thread queries device memory stats
    if maybe_initialize_distributed():
        import jax

        logger.info(
            "jax.distributed: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), len(jax.devices()),
        )
    start_memory_watchdog()
    mesh = make_mesh(config.mesh_shape)
    logger.info("config: %s", config.to_dict())
    if mesh is not None:
        logger.info("mesh: %s", mesh)

    results = run_compression(config, mesh=mesh)
    summary = {
        k: v
        for k, v in results.items()
        if k in ("baseline_ppl", "compressed_ppl", "compress_seconds", "total_seconds", "artifact_dir")
    }
    logger.info("done: %s", summary)
    return results


if __name__ == "__main__":
    main()


def _console() -> int:
    """Console-script entry: `main` returns a results dict for library
    callers; setuptools passes the return value to sys.exit, so wrap it."""
    main()
    return 0
