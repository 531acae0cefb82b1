"""Alpha compositing (volume rendering quadrature).

Parity target: /root/reference/src/render/nerf.py:169-255 composite():
  deltas_k = z_{k+1} - z_k,  delta_K = far - z_K          (nerf.py:184-188)
  alpha_k  = 1 - exp(-delta_k * relu(sigma_k))            (nerf.py:234)
  T_k      = prod_{j<k} (1 - alpha_j + 1e-10)             (nerf.py:237-240)
  w_k      = alpha_k * T_k
  rgb      = sum_k w_k rgb_k  (+ (1 - sum w) if white)    (nerf.py:245-250)
  depth    = sum_k w_k z_k

Pure function of the field outputs — model evaluation happens outside, so
this fuses into the caller under jit.  The cumulative product is an
associative scan; XLA lowers it efficiently on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("white_bkgd",))
def composite(
    rgb_sigma: jnp.ndarray,
    z_samp: jnp.ndarray,
    far: jnp.ndarray,
    white_bkgd: bool = False,
    sigma_noise: jnp.ndarray | None = None,
):
    """Composite per-point radiance/density along rays.

    :param rgb_sigma (B, K, 4): rgb in [..., :3], sigma in [..., 3]
    :param z_samp (B, K) sorted sample depths
    :param far (B,) or (B, 1) per-ray far bound
    :param sigma_noise optional (B, K) noise added to sigma pre-relu
      (training regularizer, nerf.py:231-232)
    :return (weights (B, K), rgb (B, 3), depth (B,))
    """
    far = far.reshape(far.shape[0], -1)[:, -1:]
    deltas = z_samp[:, 1:] - z_samp[:, :-1]
    delta_inf = far - z_samp[:, -1:]
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)  # (B, K)

    rgbs = rgb_sigma[..., :3]
    sigmas = rgb_sigma[..., 3]
    if sigma_noise is not None:
        sigmas = sigmas + sigma_noise

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))  # (B, K)
    alphas_shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1
    )  # (B, K+1)
    T = jnp.cumprod(alphas_shifted, axis=-1)  # (B, K+1)
    weights = alphas * T[:, :-1]  # (B, K)

    rgb_final = jnp.sum(weights[..., None] * rgbs, axis=-2)  # (B, 3)
    depth_final = jnp.sum(weights * z_samp, axis=-1)  # (B,)
    if white_bkgd:
        pix_alpha = jnp.sum(weights, axis=-1)
        rgb_final = rgb_final + (1.0 - pix_alpha)[..., None]
    return weights, rgb_final, depth_final


@partial(jax.jit, static_argnames=("mode", "gamma"))
def yolo_aggregate(out: jnp.ndarray, mode: str = "max",
                   soft_count: float = 4.0,
                   gamma: float = 1.0) -> jnp.ndarray:
    """Probability-weighted ray aggregation for YOLO mode.

    Parity (mode="max", the default): /root/reference/src/render/yolo.py:96-114:
      p_k        = sigmoid(out[..., 0])
      values     = sum_k out[..., 1:] * p_k / (sum_k p_k + 1e-5)
      final prob = max_k p_k

    mode="soft_count" (framework extension, renderer.aggregation): the
    reference's max over K is count-blind — any ray that GRAZES an object
    shares a few high-objectness sample points with the ray through the
    object's center, so at fine grids (/8) every neighbouring cell fires
    (CONVERGENCE.md r4, 3-scale diagnosis).  What separates the center
    ray from a grazing one is the CHORD LENGTH of its intersection with
    the object, i.e. how many of its K samples land inside.  soft_count
    aggregates the objectness mass S = sum_k p_k^gamma through the
    saturating squash S / (S + c) in [0, 1): few grazing hits -> small
    prob, a long interior chord -> prob near 1.  Box/class values keep
    the reference's probability-weighted mean.  The loss (losses/yolo.py)
    consumes any [0, 1] prob unchanged; training tunes p_k against the
    squash end-to-end.  c (renderer.agg_soft_count, default 4.0) is the
    hit count at which prob reaches 0.5.

    gamma (renderer.agg_gamma, default 1.0): temper exponent on p_k
    inside the mass sum.  At gamma 1 a BACKGROUND ray needs mean point
    prob < c/K (~0.003 at K=128) to aggregate below a 0.45 detection
    threshold — deep inside BCE's saturated zone, so background
    suppression trains glacially (measured: 24-epoch 3-scale run stuck
    at precision ~0.08 with recall 1.0).  gamma 2 shrinks the noise
    floor quadratically (mean p < sqrt(c/K) ~ 0.16 suffices) while a
    true chord's near-1 points keep their mass.

    mode="gated_count": prob = (max_k p_k) * S/(S+c) — the reference's
    max as a multiplicative gate.  Background cells train down through
    the max exactly as easily as the reference; the mass squash only has
    to separate center rays from grazers (both sharing a high max), which
    is the chord-length signal it measures.  Composes with gamma.

    :param out (B, K, A, 7) raw field outputs (A anchors per scale)
    :return (B, A, 7) = [prob, weighted values(6)]
    """
    probs = jax.nn.sigmoid(out[..., 0])  # (B, K, A)
    summed = jnp.sum(probs, axis=1)  # (B, A)
    vals = jnp.sum(out[..., 1:] * probs[..., None], axis=1)  # (B, A, 6)
    vals = vals / (summed[..., None] + 1e-5)
    if mode == "max":
        prob = jnp.max(probs, axis=1)  # (B, A)
    else:
        mass = summed if gamma == 1.0 else jnp.sum(probs**gamma, axis=1)
        squash = mass / (mass + soft_count)
        if mode == "soft_count":
            prob = squash
        elif mode == "gated_count":
            prob = jnp.max(probs, axis=1) * squash
        else:
            raise NotImplementedError(
                f"Unsupported yolo aggregation {mode!r}"
            )
    return jnp.concatenate([prob[..., None], vals], axis=-1)
