"""Stage breakdown + compile anatomy of the pexact step on TPU.

Times each stage of the peeled+sliced solve+subtract separately (own jit,
on-device scalar reduction + fetch, axon-safe):
  peel     pexact_plane_spectra: moments + poly fit + pair fluct planes +
           reduced-profile half-spectrum pair-FFT of the fluct stack
  moments  moment_set of I (+-2w window) alone — the exact f64 moment pass
  fluct    pair fluct-plane construction alone (pair_poly_plane + sub + wts)
  fft      the reduced-profile pair-FFT alone (fluct stack)
  greek    pexact_greek_tables given shared (smooth algebra + FF windows)
  asm      assemble_system + regularization
  solve    solve_system
  fdiff    fdiff_pexact given shared (spectral fluct model + smooth algebra)

Run: python tools/diag_pexact_stages.py [n [w [prof]]]   e.g. 4096 8 6,6,5
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
    try:
        ma = compiled.memory_analysis()
        code_mb = ma.generated_code_size_in_bytes / 1e6
        tmp_mb = ma.temp_size_in_bytes / 1e6
    except Exception:
        code_mb = tmp_mb = -1

    def sync(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        float(np.asarray(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32)))))
        return out

    import jax

    out = sync(compiled(*args))
    ts = []
    for _ in range(n_rep):
        t0 = time.time()
        out = sync(compiled(*args))
        ts.append(time.time() - t0)
    print(f"  {tag:8s} compile {t_comp:6.1f}s steady {min(ts)*1000:8.1f} ms "
          f"code {code_mb:6.1f} MB temp {tmp_mb:8.1f} MB", flush=True)
    return out


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from sfft_tpu.utils.warmup import start_device_warmup

    wu = start_device_warmup()
    import jax.numpy as jnp

    from bench import make_pair
    from sfft_tpu.config import make_config
    from sfft_tpu.core.engine import _normal_equations_impl
    from sfft_tpu.core import pexact as px
    from sfft_tpu.core.exact_fft import SliceProfile, exact_fft2_pair, \
        pair_stack
    from sfft_tpu.core.fdiff import fdiff
    from sfft_tpu.core.peel import moment_set
    from sfft_tpu.core.solve import solve_system
    from sfft_tpu.utils.jitconst import jit_const_args

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    prof = tuple(int(x) for x in sys.argv[3].split(",")) \
        if len(sys.argv) > 3 else None
    kw = dict(greek_backend="pexact", fdiff_backend="pexact", solver="exact")
    cfg = make_config(n, n, w, dtype="float64", greek_chunk=0, **kw)
    if prof is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, pexact_prof=prof)
    print(f"pexact stages at {n}^2 w={w} prof={cfg.pexact_prof} "
          f"(platform {jax.default_backend()})", flush=True)
    I, J = make_pair(n)
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))
    wu.wait()

    g = px._geom(cfg)

    def peel(I_, J_):
        return px.pexact_plane_spectra(I_, J_, cfg)

    shared = timeit(jit_const_args(peel), (Id, Jd), tag="peel")

    def moments(I_):
        return moment_set(I_, cfg.N0, cfg.N1, 2 * cfg.w0, 2 * cfg.w1,
                          g.SG, g.ax0o, g.ax1o)

    timeit(jit_const_args(moments), (Id,), tag="moments")

    def fluct(I_, mI):
        FIp = px.pair_sub(px.pair_from_f64(I_),
                          px.pair_poly_plane(mI, cfg.N0, cfg.N1))
        from sfft_tpu.core.exact_fft import pair_sep_mul

        return pair_stack([pair_sep_mul(FIp, g.ax0o.c ** int(i),
                                        g.ax1o.c ** int(j))
                           for (i, j) in g.exps_k])

    stack = timeit(jit_const_args(fluct), (Id, shared.mI), tag="fluct")

    def fftonly(st):
        return exact_fft2_pair(st, half=True,
                               prof=SliceProfile(*cfg.pexact_prof))

    timeit(jit_const_args(fftonly), (stack,), tag="fft")

    def greek(I_, J_, sh):
        return px.pexact_greek_tables(I_, J_, cfg, shared=sh)

    timeit(jit_const_args(greek), (Id, Jd, shared), tag="greek")

    def neq(I_, J_, sh):
        return _normal_equations_impl(cfg, I_, J_, shared=sh)

    lhs_rhs = timeit(jit_const_args(neq), (Id, Jd, shared), tag="greek+asm")

    def solv(lhs, rhs):
        return solve_system(cfg, lhs, rhs)

    sol = timeit(jit_const_args(solv), lhs_rhs, tag="solve")

    def fd(sol_, I_, J_, sh):
        return fdiff(cfg, sol_, None, None, J_, None, I=I_, shared=sh)

    timeit(jit_const_args(fd), (sol, Id, Jd, shared), tag="fdiff")


if __name__ == "__main__":
    main()
