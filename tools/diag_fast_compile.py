"""Bisect the fast-mode TPU compile blowup (VERDICT r3 weak #6).

Measured 2026-08-19 (bench log): fast (peeled/fft32/refined) cold compile
132.7 s vs contract 20.8-32 s at 4K, while on the CPU backend fast is the
SMALLEST program (2.1k StableHLO lines vs contract's 20.8k) and the fastest
compile (26 s vs 93 s). So the blowup is in the axon/TPU backend pass
pipeline, not frontend program size. This tool times .compile() per
component variant on the real chip with the persistent cache bypassed.

    python tools/diag_fast_compile.py            # 1024 variants + 4K fast
    python tools/diag_fast_compile.py 4096       # 4K variants only
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# deliberately NO setup_compile_cache: measure true backend compile time

from bench import make_pair, build_step  # noqa: E402
from sfft_tpu.config import make_config  # noqa: E402


def variants():
    return [
        ("contract", dict(greek_backend="exact", fdiff_backend="exact",
                          solver="exact")),
        ("fast", dict(greek_backend="peeled", fdiff_backend="fft32",
                      solver="refined")),
        ("peel+exact-fdiff+refined", dict(greek_backend="peeled",
                                          fdiff_backend="exact",
                                          solver="refined")),
        ("exact-greek+fft32+refined", dict(greek_backend="exact",
                                           fdiff_backend="fft32",
                                           solver="refined")),
        ("peel+fft32+exact-solver", dict(greek_backend="peeled",
                                         fdiff_backend="fft32",
                                         solver="exact")),
    ]


def main():
    import jax.numpy as jnp

    sizes = [int(a) for a in sys.argv[1:]] or [1024]
    w = 8
    print(f"platform: {jax.default_backend()}", file=sys.stderr, flush=True)
    for n in sizes:
        I, J = make_pair(n)
        Id = jax.device_put(jnp.asarray(I))
        Jd = jax.device_put(jnp.asarray(J))
        for tag, over in variants():
            cfg = make_config(n, n, w, dtype="float64", greek_chunk=0, **over)
            fn = build_step(cfg)
            t0 = time.time()
            lowered = fn.lower(Id, Jd)
            t1 = time.time()
            compiled = lowered.compile()
            t2 = time.time()
            print(f"{n}^2 {tag:>28}: trace {t1-t0:5.1f}s  "
                  f"tpu-compile {t2-t1:6.1f}s", flush=True)


if __name__ == "__main__":
    main()
