"""Batched indexing / view-combination helpers (pure jnp).

Parity targets: /root/reference/src/util/util.py:35-67,489-499.
"""

from __future__ import annotations

import jax.numpy as jnp


def batched_index_select_nd(t: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """Index select on dim 1 of an n-dim batched tensor.

    :param t (batch, n, ...)
    :param inds (batch, k) int
    :return (batch, k, ...)
    Parity: util.py:35-44.
    """
    inds_exp = inds.reshape(inds.shape + (1,) * (t.ndim - 2))
    return jnp.take_along_axis(
        t, jnp.broadcast_to(inds_exp, inds.shape + t.shape[2:]), axis=1
    )


def batched_index_select_nd_last(t: jnp.ndarray, inds: jnp.ndarray) -> jnp.ndarray:
    """Index select on the last dim.

    :param t (batch..., n, m)
    :param inds (batch..., k)
    :return (batch..., n, k)
    Parity: util.py:47-57.
    """
    dummy = jnp.broadcast_to(
        inds[..., None, :], inds.shape[:-1] + (t.shape[-2], inds.shape[-1])
    )
    return jnp.take_along_axis(t, dummy, axis=-1)


def repeat_interleave(x: jnp.ndarray, repeats: int, axis: int = 0) -> jnp.ndarray:
    """Repeat-interleave along axis 0 (elementwise repeat).

    Parity: util.py:60-67 (expand+reshape trick; jnp.repeat is already fast
    under XLA, kept for API parity).
    """
    if repeats == 1:
        return x
    return jnp.repeat(x, repeats, axis=axis)


def combine_interleaved(
    t: jnp.ndarray, inner_dims=(1,), agg_type: str = "average"
) -> jnp.ndarray:
    """Multi-view reduce: reshape (-1, *inner_dims, ...) and reduce dim 1.

    Parity: util.py:489-499.  Used by ResnetFC at the combine layer.
    """
    if len(inner_dims) == 1 and inner_dims[0] == 1:
        return t
    t = t.reshape((-1,) + tuple(inner_dims) + t.shape[1:])
    ns = int(t.shape[1])
    # unrolled slice adds instead of jnp.mean/max over axis 1: the
    # reduced axis has stride B*d, and XLA's reduce kernel ran at ~13%
    # of HBM bandwidth on it (r3 yolo trace, 314 ms); an elementwise
    # chain over the NS contiguous slices streams at full bandwidth and
    # fuses with the consumer.  NS is tiny (<= a few views) and static.
    if agg_type == "average":
        acc = t[:, 0]
        for i in range(1, ns):
            acc = acc + t[:, i]
        return acc / ns if ns > 1 else acc
    if agg_type == "max":
        acc = t[:, 0]
        for i in range(1, ns):
            acc = jnp.maximum(acc, t[:, i])
        return acc
    raise NotImplementedError("Unsupported combine type " + agg_type)
