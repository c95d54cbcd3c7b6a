"""dualdiff_tpu: TPU-native dual-branch conditional diffusion framework."""

import os


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache — full-model compiles take minutes;
    cache them across processes."""
    import jax

    path = path or os.environ.get(
        "DUALDIFF_COMP_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "dualdiff_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


__version__ = "0.1.0"
