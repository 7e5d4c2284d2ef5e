"""Device ops. Importing this package enables JAX x64 mode — the
conformance-critical kernels are built on exact i64 arithmetic
(sort keys, cumulative sums, IEEE-double bit emulation)."""
import jax

if not jax.config.jax_enable_x64:
    jax.config.update("jax_enable_x64", True)
