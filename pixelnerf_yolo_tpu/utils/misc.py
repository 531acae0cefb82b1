"""Small host utilities: timestamped printing, parameter counting.

Parity: /root/reference/src/util/util.py:354-355,569-572.
"""

from __future__ import annotations

import datetime

import jax
import numpy as np


def print_with_time(*args, **kwargs):
    timestamp = datetime.datetime.now().strftime("%H:%M:%S")
    message = " ".join(map(str, args))
    print(f"[{timestamp}] {message}", **kwargs)


def get_module(net):
    """Unwrap a parallel render binding to the underlying model
    (reference src/util/util.py:559-566 unwraps torch DataParallel).
    Our RenderParallel exposes .model; anything else passes through."""
    return getattr(net, "model", net)


def count_parameters(params) -> int:
    """Total number of scalars in a parameter pytree."""
    return int(
        sum(np.prod(x.shape) for x in jax.tree.leaves(params) if hasattr(x, "shape"))
    )
