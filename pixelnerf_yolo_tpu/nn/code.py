"""NeRF positional encoding.

Parity: /root/reference/src/model/code.py:6-52.  Output layout per point is
[x (if include_input), sin(f1*x), cos(f1*x), sin(f2*x), cos(f2*x), ...] with
each sin/cos block spanning all d_in dims, frequencies f_i = freq_factor *
2**i.  Stateless; implemented as one fused sin over an interleaved
frequency/phase table exactly like the reference buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class PositionalEncoding:
    def __init__(
        self,
        num_freqs: int = 6,
        d_in: int = 3,
        freq_factor: float = np.pi,
        include_input: bool = True,
    ):
        self.num_freqs = num_freqs
        self.d_in = d_in
        self.freq_factor = freq_factor
        self.include_input = include_input
        self.d_out = num_freqs * 2 * d_in + (d_in if include_input else 0)

        freqs = freq_factor * 2.0 ** np.arange(num_freqs, dtype=np.float32)
        # f1 f1 f2 f2 ... and phases 0 pi/2 0 pi/2 ... so sin(x*f + p)
        # alternates sin/cos (code.py:21-28)
        self._freqs = jnp.asarray(np.repeat(freqs, 2))[None, :, None]  # (1, 2F, 1)
        phases = np.zeros(2 * num_freqs, dtype=np.float32)
        phases[1::2] = np.pi * 0.5
        self._phases = jnp.asarray(phases)[None, :, None]  # (1, 2F, 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """:param x (..., d_in) -> (..., d_out)"""
        # profiler annotation parity: code.py:36
        with jax.named_scope("positional_enc"):
            return self._encode(x)

    def _encode(self, x: jnp.ndarray) -> jnp.ndarray:
        lead = x.shape[:-1]
        xf = x.reshape(-1, self.d_in)
        embed = xf[:, None, :] * self._freqs + self._phases  # (N, 2F, d_in)
        embed = jnp.sin(embed).reshape(xf.shape[0], -1)  # (N, 2F*d_in)
        if self.include_input:
            embed = jnp.concatenate([xf, embed], axis=-1)
        return embed.reshape(*lead, self.d_out)

    @classmethod
    def from_conf(cls, conf, d_in: int = 3) -> "PositionalEncoding":
        return cls(
            conf.get_int("num_freqs", 6),
            d_in,
            conf.get_float("freq_factor", float(np.pi)),
            conf.get_bool("include_input", True),
        )
