"""Precision modes on TPU: the f64 CONTRACT default vs the FAST mode.

The reference (thomasvrussell/sfft) computes everything in float64 on GPU.
This framework reproduces those semantics on TPU hardware that has no f64
FFT at all — and also offers an explicitly mixed-precision fast mode:

  * CONTRACT (default on TPU): greek/fdiff/solver = 'exact'
      - tables/spectra via the sliced-integer pair-FFT engine (~1e-14)
      - blocked Cholesky with exact-f64 contractions + residual refinement
      - difference built in pair arithmetic end-to-end
      - 4K^2 pair ~0.89 s on one v5e (A100 CuPy f64 reference: ~1.35 s)
  * FAST (opt-in): greek='peeled', fdiff='fft32', solver='refined'
      - smooth/fluctuation peel: exact moments + c64 FFT fluctuations
      - ~210 ms per 4K^2 pair; solution deviation up to ~7e-3 max-rel on
        ill-conditioned systems (differences stay within ~2% of the pixel
        noise) — fine for detection, use CONTRACT for precision photometry.

Run: python examples/precision_modes.py   (CPU demo sizes; on TPU the same
code picks the on-device backends automatically)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Demo-sized run: stay on CPU unless explicitly pointed at the TPU (the demo
# shapes don't amortize the remote compile; the axon sitecustomize pins the
# platform, so this must go through jax.config).
if os.environ.get("SFFT_DEMO_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from sfft_tpu.config import make_config
from sfft_tpu.core.engine import GeneralSFFT


def make_pair(n, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    I = 200.0 * (1.0 + 0.2 * xx / n + 0.3 * (yy / n) ** 2)
    for _ in range(60):
        x0, y0 = rng.uniform(6, n - 6, 2)
        I += rng.uniform(200, 2000) * np.exp(
            -((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * 1.8**2))
    J = 1.1 * I + 5.0 + rng.normal(0, 1.0, (n, n))
    return I + rng.normal(0, 1.0, (n, n)), J


def main():
    n = 512
    I, J = make_pair(n)

    # CONTRACT mode: just the defaults
    cfg = make_config(n, n, 6)
    print(f"contract config: greek={cfg.greek_backend} "
          f"fdiff={cfg.fdiff_backend} solver={cfg.solver}")
    t0 = time.time()
    sol_c, diff_c, _ = GeneralSFFT.GSS(I, J, I, J, cfg)
    print(f"contract: {time.time()-t0:.2f}s  "
          f"diff RMS {float(jnp.sqrt(jnp.mean(jnp.asarray(diff_c)**2))):.4f}")

    # FAST mode: explicit opt-in. Only meaningful on TPU — on CPU the f64
    # FFT/LU paths are already fast AND exact, so the demo reuses them there
    # (the f32-LU 'refined' solver is a TPU fast-mode tradeoff and should
    # not be used where full-f64 solves are available).
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu:
        cfg_f = make_config(n, n, 6, greek_backend="peeled",
                            fdiff_backend="fft32", solver="refined")
    else:
        cfg_f = cfg
    t0 = time.time()
    sol_f, diff_f, _ = GeneralSFFT.GSS(I, J, I, J, cfg_f)
    print(f"fast:     {time.time()-t0:.2f}s  "
          f"diff RMS {float(jnp.sqrt(jnp.mean(jnp.asarray(diff_f)**2))):.4f}")

    dev = np.max(np.abs(np.asarray(sol_c) - np.asarray(sol_f)))
    print(f"solution max abs deviation between modes: {dev:.3e}")


if __name__ == "__main__":
    main()
