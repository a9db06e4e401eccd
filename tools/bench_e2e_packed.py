"""Measure end-to-end fast-mode survey throughput with int16 H2D packing
vs plain f32 upload (VERDICT r3 weak #5 / ROUND4 #6 lever).

Run on hardware: python tools/bench_e2e_packed.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from sfft_tpu.utils.warmup import start_device_warmup

    wu = start_device_warmup()

    from bench import bench_throughput_e2e, make_pair
    from sfft_tpu.config import make_config

    def log(msg):
        print(msg, flush=True)

    n, w = 4096, 5
    I, J = make_pair(n)
    cfg_fast = make_config(n, n, w, dtype="float64", greek_chunk=0,
                           mode="fast")
    wu.wait()
    thr = bench_throughput_e2e(cfg_fast, I, J, log, nrep=6, tag="fast")
    thr_p = bench_throughput_e2e(cfg_fast, I, J, log, nrep=6, tag="fast",
                                 pack=True)
    log(f"packed speedup: {thr_p/thr:.2f}x ({thr:.3f} -> {thr_p:.3f} "
        f"pairs/s/chip)")


if __name__ == "__main__":
    main()
