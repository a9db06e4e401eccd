"""Stage breakdown of the 4K contract step on TPU (VERDICT r3 task: <1 s).

Times each stage of the contract solve+subtract separately (own jit, timed by
on-device scalar reduction + fetch, axon-safe):
  fft      7-plane exact pair-FFT (J + 6 SI), half spectra
  omg      Comg = exact_corr_window symmetric 6x6 (21 pairs, 33^2 lags)
  the      Cthe = 6 pairs, 17^2 lags
  gam      Cgam/Cdel rolled-basis pair moments
  asm      assemble_system + regularization
  solve    solve_system (exact blocked Cholesky + refinement)
  fdiff    exact difference (fwd spectra CSE'd away here: timed standalone)

Run: python tools/diag_stages.py [n [w]]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, args, n_rep=3, tag=""):
    import time as _t

    import jax.numpy as jnp

    t0 = _t.time()
    compiled = fn.lower(*args).compile()
    t_comp = _t.time() - t0
    try:
        ma = compiled.memory_analysis()
        code_mb = ma.generated_code_size_in_bytes / 1e6
        tmp_mb = ma.temp_size_in_bytes / 1e6
        arg_mb = ma.argument_size_in_bytes / 1e6
    except Exception:
        code_mb = tmp_mb = arg_mb = -1
    t0 = _t.time()
    out = compiled(*args)
    leaves = [x for x in (out if isinstance(out, tuple) else (out,))
              if hasattr(x, "dtype")]
    float(np.asarray(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32)))))
    t_first = _t.time() - t0
    print(f"  {tag:8s} compile {t_comp:6.1f}s first {t_first:6.1f}s "
          f"code {code_mb:7.1f} MB temp {tmp_mb:8.1f} MB arg {arg_mb:7.1f} MB",
          flush=True)
    fn = compiled
    out = fn(*args)
    # sync by reducing first leaf to a scalar and fetching
    leaves = [x for x in (out if isinstance(out, tuple) else (out,))
              if hasattr(x, "dtype")]
    float(np.asarray(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32)))))
    ts = []
    for _ in range(n_rep):
        t0 = time.time()
        out = fn(*args)
        leaves = [x for x in (out if isinstance(out, tuple) else (out,))
                  if hasattr(x, "dtype")]
        float(np.asarray(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32)))))
        ts.append(time.time() - t0)
    print(f"  {tag:8s} {min(ts)*1000:8.1f} ms", flush=True)
    return out, min(ts)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from bench import make_pair
    from sfft_tpu.config import make_config
    from sfft_tpu.core import exact_fft as ef
    from sfft_tpu.core.assemble import assemble_system, entangled_tables
    from sfft_tpu.core.basis import basis_1d_tables
    from sfft_tpu.core.engine import solve_and_subtract_fn
    from sfft_tpu.core.greek import (bg_static_gram, exact_bg_corr_pair)
    from sfft_tpu.core.indices import ref_basis_exponents
    from sfft_tpu.core.regularize import apply_regularization
    from sfft_tpu.core.solve import solve_system
    from sfft_tpu.utils.jitconst import jit_const_args

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = make_config(n, n, w, dtype="float64", greek_chunk=0)
    print(f"n={n} w={w} NEQ={cfg.NEQ} backend={jax.default_backend()}",
          flush=True)
    I, J = make_pair(n)
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))

    N0 = N1 = n
    Uk, Vk = basis_1d_tables(cfg.kernel_basis, N0, N1)
    exps_k = ref_basis_exponents(cfg.kernel_basis)

    def fft_stage(I, J):
        Ip = ef.pair_from_f64(I.astype(jnp.float64))
        Jp = ef.pair_from_f64(J.astype(jnp.float64))
        SIp = [ef.pair_sep_mul(Ip, Uk[:, i], Vk[:, j]) for (i, j) in exps_k]
        sp = ef.exact_fft2_pair(ef.pair_stack([Jp] + SIp), half=True)
        return tuple(v for v in sp if v is not None)

    sp_parts, t_fft = timeit(jit_const_args(fft_stage), (Id, Jd), tag="fft")
    sp = ef.CPair(*sp_parts)
    Fij = len(exps_k)

    def omg_stage(rh, rl, ih, il):
        specI = ef.CPair(rh[1:], rl[1:], ih[1:], il[1:])
        return ef.exact_corr_window(specI, specI, N0, N1, 2 * w, 2 * w,
                                    symmetric=True)

    spargs = (sp.rh, sp.rl, sp.ih, sp.il)
    Comg, t_omg = timeit(jit_const_args(omg_stage), spargs, tag="omg")

    def the_stage(rh, rl, ih, il):
        specI = ef.CPair(rh[1:], rl[1:], ih[1:], il[1:])
        specJ = ef.CPair(rh[:1], rl[:1], ih[:1], il[:1])
        return ef.exact_corr_window(specI, specJ, N0, N1, w, w)[:, 0]

    Cthe, t_the = timeit(jit_const_args(the_stage), spargs, tag="the")

    def gam_stage(I, J):
        Ip = ef.pair_from_f64(I.astype(jnp.float64))
        Jp = ef.pair_from_f64(J.astype(jnp.float64))
        SIp = [ef.pair_sep_mul(Ip, Uk[:, i], Vk[:, j]) for (i, j) in exps_k]
        SIstack = ef.pair_stack(SIp)
        Cgam = exact_bg_corr_pair(SIstack, cfg.bg_basis, N0, N1, w, w)
        Cdel = exact_bg_corr_pair(
            ef.CPair(Jp.rh[None], Jp.rl[None], None, None),
            cfg.bg_basis, N0, N1, 0, 0)[0, :, 0, 0]
        return Cgam, Cdel

    (Cgam, Cdel), t_gam = timeit(jit_const_args(gam_stage), (Id, Jd),
                                 tag="gam")
    Cphi = jnp.asarray(bg_static_gram(cfg.bg_basis, N0, N1))

    s = cfg.SCALE

    def asm_stage(Comg, Cgam, Cthe, Cphi, Cdel):
        tables = entangled_tables(cfg, (s**3) * Comg, (s**2) * Cgam,
                                  (s**2) * Cthe, s * Cphi, s * Cdel)
        lhs, rhs = assemble_system(cfg, tables)
        return apply_regularization(cfg, lhs), rhs

    (lhs, rhs), t_asm = timeit(
        jit_const_args(asm_stage), (Comg, Cgam, Cthe, Cphi, Cdel), tag="asm")

    def solve_stage(lhs, rhs):
        return solve_system(cfg, lhs, rhs)

    sol, t_solve = timeit(jit_const_args(solve_stage), (lhs, rhs), tag="solve")

    from sfft_tpu.core.fdiff import fdiff_exact

    def fdiff_stage(I, J, sol):
        return fdiff_exact(cfg, sol, I, J)

    _, t_fd = timeit(jit_const_args(fdiff_stage), (Id, Jd, sol), tag="fdiff")

    total = t_fft + t_omg + t_the + t_gam + t_asm + t_solve + t_fd
    print(f"  {'SUM':8s} {total*1000:8.1f} ms  (fdiff includes a re-run of "
          f"the fwd FFT that the fused step CSEs away)", flush=True)

    step = jit_const_args(
        lambda a, b: solve_and_subtract_fn(cfg)(a, b, a, b)[1])
    _, t_full = timeit(step, (Id, Jd), tag="FUSED")


if __name__ == "__main__":
    main()
