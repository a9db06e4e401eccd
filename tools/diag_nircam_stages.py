"""Stage breakdown of the NIRCam contract step (13,226-dof B-spline,
SEPARATE-VARYING scaling, Tikhonov reg) on TPU — where do the ~1.6 s go?

Stages (each its own jit, timed by on-device scalar reduction + fetch):
  spectra  exact_plane_spectra: pair planes + one half-spectrum pair-FFT
           (J + 25 SI + 6 SSc planes at 900^2)
  greek    greek_tables_exact given the shared spectra (windowed corrs)
  asm      entangled/separate tables + streamed assembly + Kronecker reg
  solve    solve_system (f32 Cholesky + exact-f64 residual refinement, 13k)
  fdiff    exact difference given the shared spectra

Run: python tools/diag_nircam_stages.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, args, n_rep=3, tag=""):
    import jax.numpy as jnp

    t0 = time.time()
    compiled = fn.lower(*args).compile()
    t_comp = time.time() - t0

    def sync(out):
        leaves = [x for x in (out if isinstance(out, tuple) else (out,))
                  if hasattr(x, "dtype")]
        float(np.asarray(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32)))))
        return out

    t0 = time.time()
    out = sync(compiled(*args))
    t_first = time.time() - t0
    ts = []
    for _ in range(n_rep):
        t0 = time.time()
        out = sync(compiled(*args))
        ts.append(time.time() - t0)
    print(f"  {tag:8s} compile {t_comp:6.1f}s first {t_first:6.1f}s "
          f"steady {min(ts)*1000:8.1f} ms", flush=True)
    return out, min(ts)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    from sfft_tpu.api.bspline import make_bspline_config
    from sfft_tpu.core.assemble import (GreekTables, assemble_system,
                                        entangled_tables)
    from sfft_tpu.core.greek import exact_plane_spectra, greek_tables_exact
    from sfft_tpu.core.regularize import regularization_terms
    from sfft_tpu.core.solve import solve_system
    from sfft_tpu.io import fits as sfits
    from sfft_tpu.utils.jitconst import jit_const_args

    base = "/root/reference/test/subtract_test_nircam/"
    REFN = "jw01324001001-01324-o001_t001_nircam_clear-f200w_i2d_stamp"
    SCIN = "jw02561001002-02561-o001_t003_nircam_clear-f200w_i2d_stamp"
    ref = np.nan_to_num(
        sfits.getdata(base + f"input_data/{REFN}.fits").T.astype(np.float64))
    sci = np.nan_to_num(
        sfits.getdata(base + f"input_data/{SCIN}.fits").T.astype(np.float64))
    mask = sfits.getdata(base + f"auxiliary/{SCIN}.mask4sfft.fits").T.astype(bool)
    mref, msci = np.where(mask, ref, 0.0), np.where(mask, sci, 0.0)
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
        REGULARIZE_KERNEL=True, XY_REGULARIZE=XY_REG, LAMBDA_REGULARIZE=3e-5)
    print(f"NEQ={cfg.NEQ} Fij={cfg.Fij} w={cfg.w0} backend="
          f"{jax.default_backend()} solver={cfg.solver}", flush=True)
    dt = jnp.dtype(cfg.dtype)
    Id = jax.device_put(jnp.asarray(mref))
    Jd = jax.device_put(jnp.asarray(msci))

    def spectra_stage(I, J):
        Jp, SIp, SScp, sp = exact_plane_spectra(I.astype(dt), J.astype(dt), cfg)
        return tuple(v for v in sp if v is not None)

    sp_parts, t_sp = timeit(jit_const_args(spectra_stage), (Id, Jd),
                            tag="spectra")

    # greek stage: recompute shared inside (cheap image-domain part) but time
    # relative to the spectra stage: run greek WITH shared spectra passed via
    # closure is not possible across jits — instead time (spectra+greek) and
    # subtract.
    def spectra_greek_stage(I, J):
        shared = exact_plane_spectra(I.astype(dt), J.astype(dt), cfg)
        out = greek_tables_exact(I.astype(dt), J.astype(dt), cfg,
                                 shared=shared)
        flat = list(out[:5])
        if len(out) > 5:
            flat += list(out[5])
        return tuple(flat)

    out, t_spgreek = timeit(jit_const_args(spectra_greek_stage), (Id, Jd),
                            tag="sp+greek")
    print(f"  {'greek':8s} ~{(t_spgreek - t_sp)*1000:8.1f} ms (sp+greek - "
          f"spectra)", flush=True)
    Comg, Cgam, Cthe, Cphi, Cdel = out[:5]
    sep = out[5:] if len(out) > 5 else None

    s = cfg.SCALE

    def asm_stage(Comg, Cgam, Cthe, Cphi, Cdel, *sep_tabs):
        tables = entangled_tables(cfg, (s**3) * Comg, (s**2) * Cgam,
                                  (s**2) * Cthe, s * Cphi, s * Cdel)
        if sep_tabs:
            Pbs, Pss, Pgs, Pts = sep_tabs
            tables = GreekTables(
                Pbb=tables.Pbb, Pbs=(s**3) * Pbs, Pss=(s**3) * Pss,
                Pgb=tables.Pgb, Pgs=(s**2) * Pgs,
                Ptb=tables.Ptb, Pts=(s**2) * Pts,
                Pphi=tables.Pphi, Pdel=tables.Pdel)
        reg = regularization_terms(cfg)
        return assemble_system(cfg, tables, reg_terms=reg)

    asm_args = (Comg, Cgam, Cthe, Cphi, Cdel) + tuple(sep or ())
    (lhs, rhs), t_asm = timeit(jit_const_args(asm_stage), asm_args, tag="asm")

    def solve_stage(lhs, rhs):
        return solve_system(cfg, lhs, rhs)

    sol, t_solve = timeit(jit_const_args(solve_stage), (lhs, rhs), tag="solve")

    from sfft_tpu.core.fdiff import fdiff

    def fdiff_stage(I, J, sol):
        shared = exact_plane_spectra(I.astype(dt), J.astype(dt), cfg)
        return fdiff(cfg, sol, None, None, J, None, I=I, shared=shared)

    _, t_fd = timeit(jit_const_args(fdiff_stage), (Id, Jd, sol), tag="sp+fdiff")
    print(f"  {'fdiff':8s} ~{(t_fd - t_sp)*1000:8.1f} ms (sp+fdiff - spectra)",
          flush=True)

    total = t_spgreek + t_asm + t_solve + (t_fd - t_sp)
    print(f"  {'SUM':8s} {total*1000:8.1f} ms (vs fused bench ~1580 ms)",
          flush=True)


if __name__ == "__main__":
    main()
