

def enable_compile_cache() -> None:
    """Persistent XLA compilation cache (honors JAX_COMPILATION_CACHE_DIR;
    defaults to ~/.cache/vcd_tpu_xla). Saves the multi-minute first compile
    on every CLI restart — on remote-compile TPU tunnels that compile IS
    the startup time."""
    import os

    import jax

    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "vcd_tpu_xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is best-effort; never block a run on it
