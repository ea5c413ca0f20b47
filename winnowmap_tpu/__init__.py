"""winnowmap-tpu: a TPU-native long-read genome mapper.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
marbl/Winnowmap v2.03: weighted-minimizer sketching, minimizer indexing,
seed chaining, banded affine-gap base alignment, SV-aware two-stage (MCAS)
mapping, SAM/PAF output, and a meryl-equivalent k-mer counter.
"""
__version__ = "0.1.0"


def enable_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache so the Pallas kernel
    variants (one per shape bucket / mode) compile once per machine, not
    once per process.  Called by the CLI, bench, and test entry points."""
    import os

    import jax

    path = path or os.environ.get(
        "WM_COMPILE_CACHE", os.path.expanduser("~/.cache/winnowmap_tpu_jit"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # older jax without these knobs: best-effort only
        pass


def pin_jax_platforms() -> None:
    """Honour a JAX_PLATFORMS env request via jax.config BEFORE backend
    init.  The axon TPU plugin ignores the env var, so a CPU-pinned process
    would still try to initialize the TPU client — which HANGS (not errors)
    when the chip tunnel is down.  Device code that jits without going
    through map.batch._use_device's probed gate must call this first."""
    import os

    import jax

    req = os.environ.get("JAX_PLATFORMS")
    if not req:
        return
    try:
        from jax._src import xla_bridge as _xb

        if not _xb.backends_are_initialized():
            jax.config.update("jax_platforms", req)
    except Exception:
        pass
