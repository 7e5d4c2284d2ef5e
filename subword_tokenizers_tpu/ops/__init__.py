"""Device ops. Importing this package enables JAX x64 mode — the
conformance-critical kernels are built on exact i64 arithmetic
(sort keys, cumulative sums, IEEE-double bit emulation) — and a
persistent compilation cache (remote TPU compiles here cost minutes;
caching makes every process after the first start warm)."""
import os

import jax

# Honor JAX_PLATFORMS=cpu explicitly: the axon TPU plugin registers
# itself regardless of the env var (observed r5 — `env JAX_PLATFORMS=cpu`
# alone now lands on the TPU backend), so a caller asking for CPU must be
# enforced through the config. Skipped silently if a backend is already
# initialized (then the caller managed platforms itself).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception as _e:
        # A backend is already initialized (the importer touched jax
        # first) — the CPU request can no longer be honored. Warn loudly:
        # silently landing on the TPU both invalidates CPU measurements
        # and risks a second TPU client wedging the remote-compile path.
        import sys as _sys
        print(f"[subword_tokenizers_tpu] WARNING: JAX_PLATFORMS=cpu "
              f"could not be enforced ({_e}); the active backend may be "
              f"the TPU", file=_sys.stderr)

if not jax.config.jax_enable_x64:
    jax.config.update("jax_enable_x64", True)

_cache_dir = os.environ.get(
    "SWT_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", "..",
                                  ".jax_cache"))
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization, never a requirement
    pass
