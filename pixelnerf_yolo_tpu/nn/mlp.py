"""Plain MLP field (IGR-style geometric init, skip connections).

Parity: /root/reference/src/model/mlp.py:7-137 (ImplicitNet).  Selectable
via ``mlp.type = mlp``; NOTE the reference's factory references ImplicitNet
without importing it, so ``type = mlp`` NameErrors there
(model_util.py:1-8) — fixed here, the option actually works.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import constant, normal, zeros

from ..utils.indexing import combine_interleaved


class ImplicitNet(nn.Module):
    d_out: int = 4
    dims: tuple = (128, 128, 128, 128)
    skip_in: tuple = ()
    d_latent: int = 0
    geometric_init: bool = True
    radius_init: float = 0.3
    beta: float = 0.0
    combine_layer: int = 1000
    combine_type: str = "average"

    @nn.compact
    def __call__(self, zx: jnp.ndarray, combine_inner_dims=(1,)):
        d_in = zx.shape[-1] - self.d_latent
        dims = [d_in + self.d_latent] + list(self.dims) + [self.d_out]
        act = (
            (lambda v: nn.softplus(self.beta * v) / self.beta)
            if self.beta > 0
            else nn.relu
        )

        x = zx
        for layer in range(len(dims) - 1):
            out_dim = dims[layer + 1]
            if layer + 1 in self.skip_in:
                out_dim = out_dim - d_in

            if self.geometric_init and layer == len(dims) - 2:
                k_init = normal(np.sqrt(np.pi) / np.sqrt(dims[layer]))
                b_init = constant(-self.radius_init)
            else:
                k_init = nn.initializers.variance_scaling(
                    2.0, "fan_in", "normal"
                )
                b_init = zeros
            if layer == self.combine_layer:
                x = combine_interleaved(x, combine_inner_dims, self.combine_type)
            x = nn.Dense(out_dim, kernel_init=k_init, bias_init=b_init,
                         precision="highest", name=f"lin_{layer}")(x)
            if layer + 1 in self.skip_in:
                x = jnp.concatenate([x, zx[..., self.d_latent :]], axis=-1) / np.sqrt(2)
            if layer < len(dims) - 2:
                x = act(x)
        return x

    @classmethod
    def from_conf(cls, conf, d_in: int, d_latent: int = 0, **kwargs) -> "ImplicitNet":
        return cls(
            d_out=conf.get_int("d_out", 4),
            dims=tuple(conf.get_list("dims", [128, 128, 128, 128])),
            skip_in=tuple(conf.get_list("skip_in", [])),
            d_latent=d_latent,
            geometric_init=conf.get_bool("geometric_init", True),
            radius_init=conf.get_float("radius_init", 0.3),
            beta=conf.get_float("beta", 0.0),
            combine_layer=conf.get_int("combine_layer", 1000),
            combine_type=conf.get_string("combine_type", "average"),
            **kwargs,
        )
