"""Microbenchmark: latent-table gradient accumulation strategies (TPU).

The train-step trace (PERF.md r4) attributes 24% of the 8192-ray NeRF
update to the latent gather + its backward, with the backward's
(N, C) -> (HW, C) scatter-add running at ~40% of HBM bandwidth.  The
one-hot matmul transpose is rejected on arithmetic (N*HW*C MACs); this
probes the remaining XLA-level alternative: sort the flat corner
indices (multi-operand lax.sort over scalars only), gather the scaled
gradient rows in sorted order (runs at gather bandwidth), and
segment-sum with indices_are_sorted=True.

Index distribution mimics training: samples along a ray walk a short
smooth path of latent pixels (high duplication + spatial coherence),
not uniform random.

Run on the chip:  python scripts/bench_scatter_bwd.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp


def make_indices(n_rays, n_samples, hw, seed=0):
    """Ray-coherent corner indices: each ray's samples drift across a few
    neighbouring latent pixels (matches the projective geometry of the
    real gather; duplication factor ~ n_samples / path length)."""
    rng = np.random.default_rng(seed)
    w = int(np.sqrt(hw))
    x0 = rng.integers(1, w - 2, size=(n_rays, 1))
    y0 = rng.integers(1, w - 2, size=(n_rays, 1))
    t = np.linspace(0.0, 1.0, n_samples)[None, :]
    dx = rng.integers(-3, 4, size=(n_rays, 1)) * t
    dy = rng.integers(-3, 4, size=(n_rays, 1)) * t
    xs = np.clip(np.round(x0 + dx), 0, w - 1).astype(np.int32)
    ys = np.clip(np.round(y0 + dy), 0, w - 1).astype(np.int32)
    return (ys * w + xs).reshape(-1)  # (n_rays * n_samples,)


def timeit(fn, *args, iters=20):
    """Chained timing (ADVICE r4: the r4 version claimed chaining but
    re-called fn on identical args and trusted block_until_ready, which
    returns early through the axon relay — dispatch-only timings).  Each
    fn takes a leading carry scalar folded into its weights and returns
    (out, new_carry) with new_carry data-dependent on out, so iterations
    serialize ON DEVICE; one float() sync at the end (the bench.py
    render_chained pattern)."""
    carry = jnp.zeros((), jnp.bfloat16)
    out, carry = fn(carry, *args)
    float(carry)  # compile + warm; a real sync through the relay
    t0 = time.perf_counter()
    for _ in range(iters):
        out, carry = fn(carry, *args)
    float(carry)
    return (time.perf_counter() - t0) / iters


def main():
    hw, c = 4096, 512
    n_rays, n_samples = 8192, 96  # the r4 NeRF operating point
    corners = 4
    idx_np = np.concatenate(
        [make_indices(n_rays, n_samples, hw, seed=s) for s in range(corners)]
    )
    n = idx_np.size  # 4 * rays * samples
    print(f"rows={n} table={hw}x{c} dup_factor~{n / hw:.0f}", flush=True)

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (n_rays * n_samples, c), dtype)  # dL/dgather
    wgt = jax.random.uniform(key, (n,), jnp.float32).astype(dtype)
    idx = jnp.asarray(idx_np)
    pn = jnp.tile(jnp.arange(n_rays * n_samples, dtype=jnp.int32), corners)

    @jax.jit
    def scatter_add(carry, idx, pn, wgt, g):
        wgt = wgt + carry  # (n,) bf16 — negligible vs the scatter bytes
        rows = g[pn] * wgt[:, None]
        out = jnp.zeros((hw, c), dtype).at[idx].add(rows)
        return out, out[0, 0] * jnp.bfloat16(0.0)

    @jax.jit
    def sorted_segment(carry, idx, pn, wgt, g):
        wgt = wgt + carry
        si, spn, swgt = jax.lax.sort((idx, pn, wgt), num_keys=1)
        rows = g[spn] * swgt[:, None]
        out = jax.ops.segment_sum(
            rows, si, num_segments=hw, indices_are_sorted=True
        )
        return out, out[0, 0] * jnp.bfloat16(0.0)

    @jax.jit
    def scatter_add_fused(carry, idx, wgt4, g):
        # what XLA actually sees in the real backward: 4 scatters of the
        # SAME g scaled by per-corner weights (no explicit pn gather)
        wgt4 = wgt4 + carry
        out = jnp.zeros((hw, c), dtype)
        for k in range(4):
            out = out.at[idx[k]].add(g * wgt4[k][:, None])
        return out, out[0, 0] * jnp.bfloat16(0.0)

    i4 = idx.reshape(corners, -1)
    w4 = wgt.reshape(corners, -1)

    zero = jnp.zeros((), jnp.bfloat16)
    a, _ = scatter_add(zero, idx, pn, wgt, g)
    b, _ = sorted_segment(zero, idx, pn, wgt, g)
    err = float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )
    print(f"max|scatter - sorted_segment| = {err:.4f} (bf16 order noise ok)")

    for name, fn, args in [
        ("scatter_add       ", scatter_add, (idx, pn, wgt, g)),
        ("scatter_add_fused ", scatter_add_fused, (i4, w4, g)),
        ("sorted_segment_sum", sorted_segment, (idx, pn, wgt, g)),
    ]:
        dt = timeit(fn, *args)
        # bytes: read g rows (n*c*2), write/RMW table; report rate on the
        # dominant term so strategies are comparable
        gb = n * c * 2 / 1e9
        print(f"{name} {dt * 1e3:8.2f} ms   ~{gb / dt:6.1f} GB/s eff",
              flush=True)


if __name__ == "__main__":
    main()
