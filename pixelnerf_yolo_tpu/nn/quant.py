"""Dynamic W8A8 int8 matmul for serving (model.mlp_int8).

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate
(~394 TOPS vs ~197 TFLOP/s peak).  The r3 trace measured the serving
field MLP compute-bound at 85-93% of the bf16 MXU peak, so int8 matmuls
are the one remaining >=2x lever on the block matmuls themselves
(PERF.md "Where the time goes").

Scheme: symmetric dynamic quantization — activations per-row (each ray
sample's feature vector gets its own scale, computed on the fly),
weights per-output-channel.  The int32 accumulator is exact; the only
error is the two roundings, so error does not grow with K:

    out = (x_q @ w_q) * (s_x * s_w),   x_q = round(x / s_x) in [-127,127]

Serving only: `jnp.round` has zero gradient, so a training step through
this path would silently stop updating the quantized layers — the model
gates it on encode(train=...) exactly like the int8 latent table
(models/pixelnerf.py latent_int8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray, eps: float = 1e-12):
    """Per-row symmetric int8: (..., K) -> ((..., K) int8, (..., 1) f32)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_cols(w: jnp.ndarray, eps: float = 1e-12):
    """Per-output-channel symmetric int8: (K, M) -> ((K, M) int8, (1, M))."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def dot_w8a8(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x (..., K) @ w (K, M) via dynamic int8 MXU matmul; returns f32.

    The weight quantization is K*M work per call — once per jitted
    program execution, negligible against the N*K*M matmul it feeds.
    """
    xq, sx = quantize_rows(x)
    wq, sw = quantize_cols(w)
    acc = jax.lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw
