"""Measure whether f32-Cholesky + f64-residual refinement reaches the f64
floor on the flagship NIRCam 13,226-dof B-spline system (VERDICT r2 #2).

The engine currently downgrades NEQ>=8192 TPU systems to f32 assembly+solve.
The fix needs evidence: with the REGULARIZED (Tikhonov lambda=3e-5) system,
is cond(equilibrated) * eps32 < 1 so refinement converges? This script builds
the exact system on CPU in f64, then emulates the TPU solve (f32 Cholesky
factor, f64 residuals) in numpy and tracks the error against a fully-refined
f64 LU oracle per iteration.

Run: python tools/diag_nircam_f64.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_system():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from sfft_tpu.api.bspline import make_bspline_config
    from sfft_tpu.core.engine import _plane_stacks
    from sfft_tpu.core.greek import greek_tables, greek_tables_separate
    from sfft_tpu.core.assemble import assemble_system, entangled_tables, GreekTables
    from sfft_tpu.core.regularize import apply_regularization
    from sfft_tpu.io import fits as sfits

    base = "/root/reference/test/subtract_test_nircam/"
    REFN = "jw01324001001-01324-o001_t001_nircam_clear-f200w_i2d_stamp"
    SCIN = "jw02561001002-02561-o001_t003_nircam_clear-f200w_i2d_stamp"
    ref = np.nan_to_num(sfits.getdata(base + f"input_data/{REFN}.fits").T.astype(np.float64))
    sci = np.nan_to_num(sfits.getdata(base + f"input_data/{SCIN}.fits").T.astype(np.float64))
    mask = sfits.getdata(base + f"auxiliary/{SCIN}.mask4sfft.fits").T.astype(bool)
    mI, mJ = np.where(mask, ref, 0.0), np.where(mask, sci, 0.0)
    N0, N1 = ref.shape
    rng = np.random.default_rng(10086)
    XY_REG = np.stack([rng.uniform(10.0, N0 - 10.0, 512),
                       rng.uniform(10.0, N1 - 10.0, 512)], axis=1)
    cfg = make_bspline_config(
        N0, N1, 11,
        KerSpType="B-Spline", KerSpDegree=2,
        KerIntKnotX=[0.5 + N0 / 3, 0.5 + N0 * 2 / 3],
        KerIntKnotY=[0.5 + N1 / 3, 0.5 + N1 * 2 / 3],
        SEPARATE_SCALING=True, ScaSpType="Polynomial", ScaSpDegree=2,
        BkgSpType="Polynomial", BkgSpDegree=0,
        REGULARIZE_KERNEL=True, XY_REGULARIZE=XY_REG,
        LAMBDA_REGULARIZE=3e-5,
        greek_backend="fft", fdiff_backend="fft", solver="lu")
    log(f"cfg: NEQ={cfg.NEQ} Fij={cfg.Fij} Fab={cfg.Fab} mode={cfg.scaling_mode}")

    t0 = time.time()
    s = cfg.SCALE
    mIj = jnp.asarray(mI)
    mJj = jnp.asarray(mJ)
    SI, ST, SSc = _plane_stacks(cfg, mIj)
    Comg, Cgam, Cthe, Cphi, Cdel = greek_tables(
        SI, ST, mJj, cfg.w0, cfg.w1, backend="fft", chunk=cfg.greek_chunk,
        bg_spec=cfg.bg_basis)
    tables = entangled_tables(
        cfg, (s**3) * Comg, (s**2) * Cgam, (s**2) * Cthe, s * Cphi, s * Cdel)
    if cfg.scaling_mode == "SEPARATE-VARYING":
        Pbs, Pss, Pgs, Pts = greek_tables_separate(
            SI, SSc, ST, mJj, cfg.w0, cfg.w1, backend="fft",
            chunk=cfg.greek_chunk, bg_spec=cfg.bg_basis,
            n_active=cfg.scaling_basis.num_funcs())
        tables = GreekTables(
            Pbb=tables.Pbb, Pbs=(s**3) * Pbs, Pss=(s**3) * Pss,
            Pgb=tables.Pgb, Pgs=(s**2) * Pgs,
            Ptb=tables.Ptb, Pts=(s**2) * Pts,
            Pphi=tables.Pphi, Pdel=tables.Pdel)
    lhs, rhs = assemble_system(cfg, tables)
    lhs = apply_regularization(cfg, lhs)
    lhs = np.asarray(lhs)
    rhs = np.asarray(rhs)
    log(f"system built in {time.time()-t0:.1f}s; lhs {lhs.shape} {lhs.dtype}")
    return cfg, lhs, rhs


def main():
    import scipy.linalg as sla

    cfg, lhs, rhs = build_system()
    from sfft_tpu.core.solve import _tweak_plan, _select_rows_cols
    import jax.numpy as jnp

    pres, aggregate, ij00 = _tweak_plan(cfg)
    if pres is not None:
        A = np.asarray(_select_rows_cols(jnp.asarray(lhs), pres))
        b = rhs[pres]
        log(f"tweaked system: {A.shape} (aggregate={aggregate})")
    else:
        A, b = lhs, rhs
    n = A.shape[0]

    # equilibrate
    d = 1.0 / np.sqrt(np.abs(np.diagonal(A)) + np.finfo(A.dtype).tiny)
    As = A * d[:, None] * d[None, :]
    bs = b * d

    # f64 oracle: LU + f64 refinement
    t0 = time.time()
    lu, piv = sla.lu_factor(As)
    x64 = sla.lu_solve((lu, piv), bs)
    for _ in range(3):
        r = bs - As @ x64
        x64 = x64 + sla.lu_solve((lu, piv), r)
    log(f"f64 LU oracle in {time.time()-t0:.1f}s; "
        f"resid {np.linalg.norm(bs - As @ x64)/np.linalg.norm(bs):.2e}")

    # condition estimate via power iteration on As and on the inverse
    rng = np.random.default_rng(0)
    v = rng.normal(size=n)
    for _ in range(30):
        v = As @ v
        v /= np.linalg.norm(v)
    lmax = float(v @ (As @ v))
    w = rng.normal(size=n)
    for _ in range(30):
        w = sla.lu_solve((lu, piv), w)
        w /= np.linalg.norm(w)
    lmin = float(w @ (As @ w))
    log(f"cond(equilibrated) ~ {lmax/abs(lmin):.3e} "
        f"(lmax {lmax:.3e}, lmin {lmin:.3e}); "
        f"cond*eps32 = {lmax/abs(lmin)*6e-8:.3e}")

    # TPU-emulated solve: f32 Cholesky factor + f64 residual refinement
    t0 = time.time()
    A32 = As.astype(np.float32)
    try:
        L32 = sla.cholesky(A32, lower=True)
    except Exception as e:
        log(f"f32 Cholesky FAILED: {e}; trying jittered")
        L32 = sla.cholesky(A32 + 1e-6 * np.eye(n, dtype=np.float32) *
                           np.diag(A32).mean(), lower=True)
    log(f"f32 cholesky in {time.time()-t0:.1f}s")

    def f32_solve(r):
        y = sla.solve_triangular(L32, r.astype(np.float32), lower=True)
        return sla.solve_triangular(L32.T, y, lower=False).astype(np.float64)

    x = f32_solve(bs)
    scale = np.max(np.abs(x64))
    for it in range(8):
        err = np.max(np.abs(x - x64)) / scale
        r = bs - As @ x
        log(f"iter {it}: max-rel err vs f64 oracle {err:.3e}, "
            f"rel resid {np.linalg.norm(r)/np.linalg.norm(bs):.3e}")
        x = x + f32_solve(r)
    err = np.max(np.abs(x - x64)) / scale
    log(f"final: max-rel err {err:.3e}")

    # solution-space effect: also report error in the UNtweaked variables
    np.savez("/tmp/nircam_system.npz", A=As.astype(np.float64), b=bs, d=d,
             x64=x64)
    log("saved /tmp/nircam_system.npz")


if __name__ == "__main__":
    main()
