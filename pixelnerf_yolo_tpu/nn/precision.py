"""Matmul/conv precision policy.

float32 compute (bit-parity mode) pins ``precision="highest"`` so results
match the PyTorch reference op-for-op.  bfloat16 compute (production mode)
must use the hardware default: bf16 MXU passes with f32 accumulation.
Passing ``highest`` with bf16 inputs instead forces XLA's multi-pass
emulation — measured ~7x slower on the flax field-MLP path (which is also
the training backward via the fused kernel's custom_vjp).
"""

from __future__ import annotations

import jax.numpy as jnp


def matmul_precision(dtype) -> str | None:
    return "highest" if jnp.dtype(dtype) == jnp.float32 else None
