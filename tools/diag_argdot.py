"""Is an int8 dot with a runtime-argument operand slower per call than the
same dot with the operand embedded as a constant? (Param re-layout probe.)

Run: python -u tools/diag_argdot.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def steady(fn, *args, nrep=6):
    np.asarray(fn(*args))
    ts = []
    for _ in range(nrep):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    log(f"platform: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    # deep-path shape: (12288, 2049) i8 x (2049, 1024) i8 -> i32
    D = (rng.random((12288, 2049)) * 50).astype(np.int8)
    W = (rng.random((2049, 1024)) * 50).astype(np.int8)
    Dd = jax.device_put(jnp.asarray(D))
    Wd = jax.device_put(jnp.asarray(W))
    np.asarray(jnp.sum(Dd.astype(jnp.int32)))

    def dot(d, w):
        return jnp.sum(lax.dot_general(
            d, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))

    f_const = jax.jit(lambda d: dot(d, jnp.asarray(W)))
    f_arg = jax.jit(dot)
    t_c = steady(f_const, Dd)
    t_a = steady(f_arg, Dd, Wd)
    log(f"int8 dot 12288x2049x1024: const-W {t_c*1000:.1f}ms  arg-W {t_a*1000:.1f}ms")

    # 16 such dots back to back (closer to the real program's table count)
    f_const16 = jax.jit(lambda d: sum(
        jnp.sum(lax.dot_general(d, jnp.asarray(W) + np.int8(k),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32))
        for k in range(16)))
    Ws = [jax.device_put(jnp.asarray(W + np.int8(k))) for k in range(16)]
    f_arg16 = jax.jit(lambda d, ws: sum(
        jnp.sum(lax.dot_general(d, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32))
        for w in ws))
    t_c16 = steady(f_const16, Dd)
    t_a16 = steady(f_arg16, Dd, Ws)
    log(f"16x int8 dots: const-W {t_c16*1000:.1f}ms  arg-W {t_a16*1000:.1f}ms")

    # f32 variant of the same (is relayout int8-specific?)
    Wf = W.astype(np.float32)
    Df32 = D.astype(np.float32)
    Dfd = jax.device_put(jnp.asarray(Df32))
    Wfd = jax.device_put(jnp.asarray(Wf))

    def dotf(d, w):
        return jnp.sum(lax.dot_general(d, w, (((1,), (0,)), ((), ()))))

    t_cf = steady(jax.jit(lambda d: dotf(d, jnp.asarray(Wf))), Dfd)
    t_af = steady(jax.jit(dotf), Dfd, Wfd)
    log(f"f32 dot same shape: const-W {t_cf*1000:.1f}ms  arg-W {t_af*1000:.1f}ms")


if __name__ == "__main__":
    main()
