"""Diagnose the contract-mode first-execution cost on TPU (VERDICT r2 #1).

Round-2 bench: trace 6.1 s + compile 24.9 s + FIRST EXEC 420 s at 4K.
Hypotheses:
  H1  embedded HLO constants shipped to the device at first dispatch over the
      ~47 MB/s axon tunnel (the sliced static matrices are jnp.asarray'd
      numpy constants inside the jitted body);
  H2  first-call autotuning / lazy secondary compilation;
  H3  host-side work at dispatch (e.g. constant re-layout).

Method: time trace / compile / exec1 / exec2 for (a) a synthetic jit whose
only payload is a big embedded constant, (b) each pipeline piece of the
contract engine at the bench shape. Report memory_analysis() sizes.

Usage: python tools/diag_coldstart.py [N]
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(tag, fn, *args):
    t0 = time.time()
    lowered = fn.lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    try:
        ma = compiled.memory_analysis()
        sizes = (f"code={ma.generated_code_size_in_bytes/1e6:.1f}MB "
                 f"arg={ma.argument_size_in_bytes/1e6:.1f}MB "
                 f"out={ma.output_size_in_bytes/1e6:.1f}MB "
                 f"tmp={ma.temp_size_in_bytes/1e6:.1f}MB")
    except Exception as e:
        sizes = f"(memory_analysis failed: {e})"
    out = np.asarray(compiled(*args))
    t3 = time.time()
    out = np.asarray(compiled(*args))
    t4 = time.time()
    log(f"[{tag}] trace {t1-t0:.1f}s compile {t2-t1:.1f}s "
        f"exec1 {t3-t2:.1f}s exec2 {t4-t3:.2f}s  {sizes}")
    return compiled


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sfft_tpu_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    log(f"platform: {jax.default_backend()}, devices: {jax.devices()}")

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    # (H1 embedded-constant probes moved to tools/diag_consts.py; outcome:
    # consts upload at 11-18 MB/s but the real program embeds only ~2-5 MB,
    # so constants are NOT the 420 s cause. These pieces find what is.)

    # --- pipeline pieces at bench shape ---------------------------------
    sys.path.insert(0, "/root/repo")
    from bench import make_pair
    from sfft_tpu.config import make_config
    from sfft_tpu.core.engine import _solve_impl, _subtract_impl
    from sfft_tpu.core.exact_fft import exact_fft2_pair, pair_from_f64
    from sfft_tpu.core.greek import greek_tables_exact

    cfg = make_config(n, n, 8, dtype="float64", greek_chunk=0)
    I, J = make_pair(n)
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))

    # P1: one full-plane pair FFT (half spectra), reduced to a scalar
    def p1(I):
        sp = exact_fft2_pair(pair_from_f64(I), half=True)
        return sum(jnp.sum(jnp.abs(v)) for v in sp if v is not None)

    timeit("P1 exact_fft2 1 plane", jax.jit(p1), Id)

    # P2: the full exact greek tables
    def p2(I, J):
        out = greek_tables_exact(I, J, cfg)
        return sum(jnp.sum(jnp.abs(t)) for t in out[:5])

    timeit("P2 greek_tables_exact", jax.jit(p2), Id, Jd)

    # P3: solve only (tables + assemble + exact solve)
    def p3(I, J):
        return jnp.sum(jnp.abs(_solve_impl(cfg, I, J)))

    c3 = timeit("P3 solve", jax.jit(p3), Id, Jd)

    # P4: subtract only, with a fixed dummy solution
    sol = jax.device_put(jnp.zeros((cfg.NEQ,), jnp.float64).at[0].set(1.0))

    def p4(I, J, sol):
        return jnp.sum(jnp.abs(_subtract_impl(cfg, I, J, sol)))

    timeit("P4 fdiff exact", jax.jit(p4), Id, Jd, sol)


if __name__ == "__main__":
    main()
