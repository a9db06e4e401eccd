"""Time every preamble step of a fresh contract process on axon:
import, pair synthesis, input device_put issue, input H2D sync,
tiny-program compile. Finds where the ~290 s unaccounted cold-start goes.

Run: python tools/diag_preamble.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

T0 = time.time()


def mark(tag, t_prev):
    t = time.time()
    print(f"  {tag:42s} {t - t_prev:8.1f}s  (t+{t - T0:7.1f}s)", flush=True)
    return t


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    t = T0
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    t = mark("import jax + cache setup", t)
    from bench import build_step, make_pair
    from sfft_tpu.config import make_config

    t = mark("import bench/sfft_tpu", t)
    dev = jax.devices()[0]
    t = mark("jax.devices() (backend init)", t)
    I, J = make_pair(n)
    t = mark(f"make_pair({n})", t)
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))
    t = mark("device_put issue (async)", t)
    s = jax.jit(lambda a, b: (a[:2, :2] + b[:2, :2]).sum())
    c = s.lower(Id, Jd).compile()
    t = mark("tiny-sum compile", t)
    float(np.asarray(c(Id, Jd)))
    t = mark("tiny-sum exec (syncs input H2D)", t)
    # second big upload for comparison: is first-process H2D slower?
    Kd = jax.device_put(jnp.asarray(J + 1.0))
    t = mark("second device_put issue", t)
    float(np.asarray(c(Id, Kd)))
    t = mark("second upload sync", t)
    cfg = make_config(n, n, 8, dtype="float64", greek_chunk=0)
    fn = build_step(cfg)
    compiled = fn.lower(Id, Jd).compile()
    t = mark("contract compile(+const puts)", t)
    out = np.asarray(compiled(Id, Jd)[0])
    t = mark(f"first dispatch (rms {out[0]:.4f})", t)
    out = np.asarray(compiled(Id, Jd)[0])
    t = mark("second dispatch", t)
    print(f"total {time.time()-T0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
