"""Multi-chip sharded 2-D FFT over a device mesh.

The reference is single-node with zero inter-GPU communication; for very large
mosaics SURVEY.md (§5) identifies sharded 2-D FFTs across ICI as the genuine
TPU-native scaling path. Standard pencil decomposition via shard_map:

  rows sharded over the mesh -> local FFT along columns (unsharded axis)
  -> all-to-all transpose (ICI) -> local FFT along the other axis
  -> all-to-all back (optional, to return to the input sharding)

This keeps each chip's FFT fully local and rides the interconnect only for
the transposes, which is how distributed FFTs are done on any mesh fabric.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _all_to_all_transpose(block: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(rows_local, cols_full) -> (rows_full, cols_local) on each device.

    block is the local shard (N0/d, N1). Split axis 1 into d chunks, exchange
    chunk i with device i, concatenate received chunks along axis 0.
    """
    d = jax.lax.psum(1, axis_name)
    n0l, n1 = block.shape
    # (d, n0l, n1/d)
    parts = block.reshape(n0l, d, n1 // d).transpose(1, 0, 2)
    exch = jax.lax.all_to_all(parts, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)
    # exch: (d, n0l, n1/d) where exch[k] is the k-th row-chunk of our column
    return exch.reshape(d * n0l, n1 // d)


def sharded_fft2(
    x: jnp.ndarray, mesh: Mesh, axis_name: str = "data"
) -> jnp.ndarray:
    """2-D FFT of a (N0, N1) array sharded over mesh axis 0.

    Returns the full transform with the same row sharding. Requires N0 and N1
    divisible by the mesh size. complex64/complex128 per platform support.
    """
    d = mesh.devices.size

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(axis_name, None), out_specs=P(axis_name, None),
    )
    def _fft(local):  # local: (N0/d, N1)
        f1 = jnp.fft.fft(local, axis=1)
        t = _all_to_all_transpose(f1, axis_name)      # (N0, N1/d)
        f2 = jnp.fft.fft(t, axis=0)
        # transpose back to row sharding: (N0/d, N1)
        return _all_to_all_transpose(f2.T, axis_name).T

    return _fft(x)


def sharded_subtract_step(cfg, mesh: Mesh, axis_name: str = "data"):
    """Experimental: single huge-pair solve with row-sharded inputs.

    The Greek/moment matmuls and FFT batches partition cleanly over image
    rows; the tiny normal system is solved replicated. Currently exposed as a
    sharding-annotated jit (XLA inserts the collectives); a hand-scheduled
    shard_map pipeline is future work.
    """
    from sfft_tpu.core.engine import solve_and_subtract_fn

    step = solve_and_subtract_fn(cfg)
    sharded = NamedSharding(mesh, P(axis_name, None))

    @jax.jit
    def run(I, J, mI, mJ):
        I, J, mI, mJ = (jax.lax.with_sharding_constraint(a, sharded)
                        for a in (I, J, mI, mJ))
        return step(I, J, mI, mJ)

    return run
