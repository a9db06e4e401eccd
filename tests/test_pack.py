"""int16 H2D packing (utils/pack.py + parallel/batch.py packed survey path).

The pack exists because the axon H2D tunnel is a measured GLOBAL ~50 MB/s
(tools/diag_h2d_streams.py) — halving bytes is the only throughput lever.
These tests pin (1) the quantization error bound, (2) NaN round-trip
semantics, (3) the packed mesh-batch path agreeing with the unpacked one
inside fast mode's accuracy floor.
"""

import numpy as np
import pytest

import sfft_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from sfft_tpu.utils.pack import pack_i16, unpack_i16, pack_stack_i16


def test_pack_roundtrip_error_bound(rng):
    a = (rng.normal(size=(130, 97)) *
         np.exp(rng.normal(0, 3, size=(130, 97)))).astype(np.float32)
    p = pack_i16(a, block=64)
    out = np.asarray(jax.jit(
        lambda q, s: unpack_i16(q, s, p.n0, p.block))(p.q, p.scales))
    assert out.shape == a.shape
    # bound: 0.5 * scale per block (scale = blockmax / 32767)
    nb = p.q.shape[0] // p.block
    ap = np.zeros((nb * p.block, a.shape[1]), np.float32)
    ap[: a.shape[0]] = a
    bmax = np.abs(ap.reshape(nb, p.block, -1)).max(axis=(1, 2))
    bound = 0.5 * bmax / 32767.0 + 1e-12
    for b in range(nb):
        lo, hi = b * p.block, min((b + 1) * p.block, a.shape[0])
        blk_err = np.max(np.abs(out[lo:hi] - a[lo:hi]))
        assert blk_err <= bound[b], (b, blk_err, bound[b])


def test_pack_nan_and_zero_blocks(rng):
    a = rng.normal(size=(64, 40)).astype(np.float32)
    a[3, 7] = np.nan
    a[50, :] = np.nan
    z = np.zeros((128, 40), np.float32)  # zero block: scale 1.0, exact
    p = pack_i16(a, block=32)
    out = np.asarray(unpack_i16(jnp.asarray(p.q), jnp.asarray(p.scales),
                                p.n0, p.block))
    assert np.isnan(out[3, 7]) and np.isnan(out[50]).all()
    finite = ~np.isnan(a)
    assert np.isfinite(out[finite]).all()
    pz = pack_i16(z, block=64)
    outz = np.asarray(unpack_i16(jnp.asarray(pz.q), jnp.asarray(pz.scales),
                                 pz.n0, pz.block))
    assert (outz == 0.0).all()


def test_batched_subtract_packed_matches_unpacked(rng):
    """Packed fast-mode survey path over the 8-device mesh == unpacked path
    within the quantization grade (both far inside fast mode's ~7e-3 floor)."""
    from sfft_tpu.parallel.batch import (batched_subtract,
                                         batched_subtract_packed,
                                         make_data_mesh)
    from tests.test_engine import make_pair, base_cfg

    cfg = base_cfg(N0=32, N1=32, w=1)
    Is, Js = [], []
    for k in range(8):
        I, J = make_pair(rng, N0=32, N1=32)
        Is.append(I)
        Js.append(J)
    I = np.stack(Is)
    J = np.stack(Js)
    mesh = make_data_mesh(8)
    sols, diffs, _ = batched_subtract(I, J, I, J, cfg, mesh)
    psols, pdiffs, _ = batched_subtract_packed(I, J, I, J, cfg, mesh,
                                               block=32)
    # the ~1.5e-5 input quantization is amplified by the small test
    # system's conditioning to ~3e-3 solution deviation (measured) — inside
    # fast mode's documented ~7e-3 floor; a packed-layout bug would read as
    # O(1) garbage, which is what this guards against
    sref = np.asarray(sols)
    scale = np.max(np.abs(sref))
    assert np.max(np.abs(np.asarray(psols) - sref)) / scale < 1e-2
    dref = np.asarray(diffs)
    rms = np.sqrt(np.mean((np.asarray(pdiffs) - dref) ** 2))
    assert rms < 1e-2 * np.max(np.abs(dref))
