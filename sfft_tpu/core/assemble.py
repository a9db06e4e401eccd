"""Normal-equation assembly from correlation tables via static gathers.

Replaces the reference's FillLS_{OMG,GAM,PSI,PHI,THE,DEL} scatter kernels
(sfft/sfftcore/SFFTConfigure.py:197-688). The reference's four algebraic cases
per entry (on whether the row/column kernel offset is the center pixel) come
from the delta-function kernel basis: the basis image for offset (a, b) is
  shift(I_ij, (a, b)) - I_ij   for (a, b) != 0,
  I_ij                         for (a, b) == 0.
Writing row terms as {(shift a8, +1), (id, -1)} (non-center) or {(id, +1)}
(center) and likewise for columns, every LHMAT entry is

  sum_{r, c} s_r * s_c * CC[idx, a_r - a_c, b_r - b_c]

— four gathers from the lag tables with sign masks, fully vectorized; no
scatter, no per-entry control flow. The gather index tables are static numpy
constants per config, so XLA sees pure gathers.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from sfft_tpu.config import SFFTConfig
from sfft_tpu.core.indices import ab_tables


@lru_cache(maxsize=64)
def _gather_plan(cfg: SFFTConfig):
    """Static index/sign tables for the assembly gathers."""
    a, b, nz = ab_tables(cfg)
    w0, w1 = cfg.w0, cfg.w1
    R1o = 4 * w1 + 1  # OMG lag table width
    r1 = 2 * w1 + 1  # GAM/THE lag table width

    c1 = nz.astype(np.float64)  # shift-term coefficient
    c0 = 1.0 - 2.0 * c1  # identity-term coefficient (+1 center, -1 else)

    # OMG: flat indices into (4w0+1)*(4w1+1) lag raster
    def oflat(la, lb):
        return ((la + 2 * w0) * R1o + (lb + 2 * w1)).astype(np.int32)

    omg_cross = oflat(a[:, None] - a[None, :], b[:, None] - b[None, :])  # (Fab, Fab)
    omg_row = oflat(a, b)  # (Fab,)
    omg_col = oflat(-a, -b)  # (Fab,)
    omg_zero = int(oflat(np.zeros(1, np.int64), np.zeros(1, np.int64))[0])

    # GAM/THE: lags a8 in [-w, w]; PSI: lags -a in [-w, w]
    def gflat(la, lb):
        return ((la + w0) * r1 + (lb + w1)).astype(np.int32)

    g_row = gflat(a, b)
    g_col_neg = gflat(-a, -b)
    g_zero = int(gflat(np.zeros(1, np.int64), np.zeros(1, np.int64))[0])

    return dict(
        c1=c1, c0=c0,
        omg_cross=omg_cross, omg_row=omg_row, omg_col=omg_col, omg_zero=omg_zero,
        g_row=g_row, g_col_neg=g_col_neg, g_zero=g_zero,
    )


def assemble_system(
    cfg: SFFTConfig,
    Comg: jnp.ndarray,
    Cgam: jnp.ndarray,
    Cthe: jnp.ndarray,
    Cphi: jnp.ndarray,
    Cdel: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (LHMAT, RHb) of the NEQ x NEQ normal equations.

    Inputs are the *scaled* Pre tables (engine applies SCALE powers), matching
    the reference's PreOMG/PreGAM/PrePSI/PrePHI/PreTHE/PreDEL values so the
    resulting system is identical to sfft/sfftcore/SFFTSubtract.py:616-729.
    The PSI block is derived from the GAM table by the correlation mirror
    identity CC(T, I)[d] = CC(I, T)[-d] (equal scale factors), halving the work.
    """
    p = _gather_plan(cfg)
    Fij, Fpq, Fab = cfg.Fij, cfg.Fpq, cfg.Fab
    dt = Comg.dtype
    c1 = jnp.asarray(p["c1"], dt)
    c0 = jnp.asarray(p["c0"], dt)

    # ---- OMG block: (Fij*Fab, Fij*Fab) -------------------------------
    Pf = Comg.reshape(Fij, Fij, -1)
    t_cross = Pf[:, :, p["omg_cross"]]                # (Fij, Fij, Fab, Fab)
    t_row = Pf[:, :, p["omg_row"]][:, :, :, None]     # (Fij, Fij, Fab, 1)
    t_col = Pf[:, :, p["omg_col"]][:, :, None, :]     # (Fij, Fij, 1, Fab)
    t_zero = Pf[:, :, p["omg_zero"]][:, :, None, None]
    r1c = c1[:, None]
    r0c = c0[:, None]
    k1c = c1[None, :]
    k0c = c0[None, :]
    omg = r1c * k1c * t_cross + r1c * k0c * t_row + r0c * k1c * t_col + r0c * k0c * t_zero
    # rows are (i8j8, a8b8), cols are (ij, ab)
    omg = jnp.transpose(omg, (0, 2, 1, 3)).reshape(Fij * Fab, Fij * Fab)

    # ---- GAM block: (Fij*Fab, Fpq) ------------------------------------
    Gf = Cgam.reshape(Fij, Fpq, -1)
    g_row = Gf[:, :, p["g_row"]]                      # (Fij, Fpq, Fab)
    g_zero = Gf[:, :, p["g_zero"]][:, :, None]
    gam = c1[None, None, :] * g_row + c0[None, None, :] * g_zero
    gam = jnp.transpose(gam, (0, 2, 1)).reshape(Fij * Fab, Fpq)

    # ---- PSI block: (Fpq, Fij*Fab) — mirror of GAM --------------------
    # PrePSI[pq, ij, d] = PreGAM[ij, pq, -d]; the assembly needs lags -a (and 0).
    s_col = Gf[:, :, p["g_row"]]                      # GAM at +a == PSI at -a
    psi = c1[None, None, :] * s_col + c0[None, None, :] * g_zero
    psi = jnp.transpose(psi, (1, 0, 2)).reshape(Fpq, Fij * Fab)

    # ---- THE / DEL RHS -------------------------------------------------
    Tf = Cthe.reshape(Fij, -1)
    the = c1[None, :] * Tf[:, p["g_row"]] + c0[None, :] * Tf[:, p["g_zero"]][:, None]
    the = the.reshape(Fij * Fab)

    lhs = jnp.block([[omg, gam], [psi, Cphi]])
    rhs = jnp.concatenate([the, Cdel])
    return lhs, rhs
