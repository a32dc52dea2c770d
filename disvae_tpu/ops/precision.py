"""Numeric precision policy.

On TPU, float32 matmuls/convs default to bfloat16 MXU passes (DEFAULT
precision), which is the fast path but drifts ~1e-2 from a CUDA f32 reference.
Parity gates against the PyTorch golden artifacts need `highest`; throughput
benchmarks may choose `default`/bf16. The CLI exposes this as `--precision`.
"""

import jax

PRECISIONS = ["highest", "high", "default"]


def configure(precision="highest"):
    """Set the global default matmul/conv precision."""
    if precision not in PRECISIONS:
        raise ValueError("Unknown precision: {} (choose from {})".format(
            precision, PRECISIONS))
    jax.config.update("jax_default_matmul_precision",
                      None if precision == "default" else precision)


def fast_matmul_policy():
    """True when the ambient policy runs bf16 MXU passes (the TPU
    production-throughput configuration). Custom backward passes key off
    this at TRACE time: fast-policy formulations may reassociate into bf16
    contractions; parity policies (highest/high) must emit the exact
    autodiff primitives."""
    return jax.config.jax_default_matmul_precision in (None, "default",
                                                       "bfloat16")
