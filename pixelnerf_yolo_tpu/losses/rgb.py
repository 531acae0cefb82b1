"""RGB + alpha regularization losses.

Parity: /root/reference/src/model/loss.py:5-104.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(outputs, targets):
    return jnp.mean((outputs - targets) ** 2)


def l1_loss(outputs, targets):
    return jnp.mean(jnp.abs(outputs - targets))


class RGBWithUncertainty:
    """Kendall '17 uncertainty loss (loss.py:52-69)."""

    def __init__(self, conf):
        self.use_l1 = conf.get_bool("use_l1")

    def __call__(self, outputs, targets, betas):
        elem = (
            jnp.abs(outputs - targets)
            if self.use_l1
            else (outputs - targets) ** 2
        )
        weighted = jnp.mean(elem, -1) / betas
        return jnp.mean(weighted) + jnp.mean(jnp.log(betas))


class RGBWithBackground:
    """Background-weighted variant (loss.py:72-89)."""

    def __init__(self, conf):
        self.use_l1 = conf.get_bool("use_l1")

    def __call__(self, outputs, targets, lambda_bg):
        elem = (
            jnp.abs(outputs - targets)
            if self.use_l1
            else (outputs - targets) ** 2
        )
        weighted = jnp.mean(elem, -1) / (1 + lambda_bg)
        return jnp.mean(weighted) + jnp.mean(jnp.log(lambda_bg))


def weighted_rgb_loss(crit, outputs, targets, w):
    """``crit`` with per-ray weights: pad rays (w=0) drop out of the mean
    exactly, so sharded updates on padded batches match unpadded math.

    :param outputs/targets (..., R, 3); w (..., R) in {0, 1}, or None for
      an unpadded batch (defers to ``crit`` verbatim — reference
      semantics, loss.py:92-104)
    Only the elementwise criteria (mse/l1) support exact per-ray
    weighting; a non-elementwise criterion (RGBWithUncertainty /
    RGBWithBackground) cannot drop padded rays from its mean, so mixing
    one with mesh padding would silently contaminate the loss — raise
    instead of guessing.  (Note use_uncertainty is equally non-functional
    in the reference fork: its trainer calls the crit with 2 args while
    RGBWithUncertainty requires betas that no model predicts,
    /root/reference/train/trainlib/PixelNerfTrainer.py:150.)
    """
    if w is None:
        return crit(outputs, targets)
    if crit is mse_loss:
        elem = (outputs - targets) ** 2
    elif crit is l1_loss:
        elem = jnp.abs(outputs - targets)
    else:
        raise TypeError(
            f"weighted_rgb_loss only supports elementwise criteria "
            f"(mse_loss/l1_loss); got {type(crit).__name__}. "
            "loss.rgb.use_uncertainty is incompatible with the sharded "
            "trainer's padded ray batches — disable it or add an "
            "uncertainty-aware weighted form."
        )
    per_ray = jnp.mean(elem, axis=-1)
    return jnp.sum(per_ray * w) / jnp.maximum(jnp.sum(w), 1.0)


def get_rgb_loss(conf, coarse=True, using_bg=False, reduction="mean"):
    """loss.py:92-104."""
    if conf.get_bool("use_uncertainty", False) and not coarse:
        print("using loss with uncertainty")
        return RGBWithUncertainty(conf)
    print("using vanilla rgb loss")
    return l1_loss if conf.get_bool("use_l1") else mse_loss


class AlphaLossNV2:
    """Neural Volumes alpha regularizer, epoch-gated (loss.py:5-38).

    Stateless: the epoch counter is an argument (the reference keeps it in
    a buffer advanced by sched_step).
    """

    def __init__(self, lambda_alpha, clamp_alpha, init_epoch,
                 force_opaque=False):
        self.lambda_alpha = lambda_alpha
        self.clamp_alpha = clamp_alpha
        self.init_epoch = init_epoch
        self.force_opaque = force_opaque

    def __call__(self, alpha_fine, epoch: int = 0):
        if self.lambda_alpha <= 0.0 or epoch < self.init_epoch:
            return jnp.zeros(())
        alpha_fine = jnp.clip(alpha_fine, 0.01, 0.99)
        if self.force_opaque:
            bce = -(jnp.log(alpha_fine))  # BCE vs all-ones target
            return self.lambda_alpha * jnp.mean(bce)
        alpha_loss = jnp.log(alpha_fine) + jnp.log(1.0 - alpha_fine)
        alpha_loss = jnp.maximum(alpha_loss, -self.clamp_alpha)
        return self.lambda_alpha * jnp.mean(alpha_loss)


def get_alpha_loss(conf):
    return AlphaLossNV2(
        conf.get_float("lambda_alpha"),
        conf.get_float("clamp_alpha"),
        conf.get_int("init_epoch"),
        force_opaque=conf.get_bool("force_opaque", False),
    )
