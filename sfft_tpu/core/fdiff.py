"""Difference-image construction from a solved coefficient vector.

Reference: Kab phase factors + Construct_FDIFF + ifft2
(sfft/sfftcore/SFFTSubtract.py:771-816, sfft/sfftcore/SFFTConfigure.py:734-809).
The reference evaluates, per output pixel, a sum over all Fij*Fab terms with
per-pixel phase products W_l^a W_m^b. Two TPU-native reformulations:

'fft' backend — the phase sum factorizes: the per-ij kernel spectrum is
    K_ij[u, v] = sum_ab A[ij, a, b] W_u^a W_v^b = (W0 @ A_ij @ W1)[u, v],
two skinny matmuls (N0 x L0 and L1 x N1h) instead of a per-pixel loop, and
everything runs on half-spectra (all factors are Hermitian — the reference
does full complex FFTs and takes .real at the end).

'conv' backend — complex-free: in the delta basis, multiplying by (W^a W^b - 1)
is shift-minus-identity, so the model is a circular convolution with the
*standard-basis* kernel (center coefficient 2*a_ij00 - sum_ab a_ijab — exactly
the SVKDict_SFFT2ST conversion, sfft/utils/SFFTSolutionReader.py:102-114):
    D = J - SCALE * sum_ij circconv(I * beta_ij, Astd_ij) - sum_pq b_pq T_pq.
This runs as a grouped lax.conv on wrap-padded planes — the float64 TPU path
(no complex128 on TPU).
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from sfft_tpu.config import SFFTConfig


def _phase_matrices(cfg: SFFTConfig, half: bool = True):
    """W0[u, a] = exp(-2i pi u a / N0) for a in [-w0, w0]; W1[b, v] likewise.

    Static numpy constants (complex128 on CPU-style dtypes, complex64 for f32).
    """
    N0, N1 = cfg.N0, cfg.N1
    a = np.arange(-cfg.w0, cfg.w0 + 1)
    b = np.arange(-cfg.w1, cfg.w1 + 1)
    u = np.arange(N0)
    v = np.arange(N1 // 2 + 1 if half else N1)
    W0 = np.exp((-2j * np.pi / N0) * np.outer(u, a))
    W1 = np.exp((-2j * np.pi / N1) * np.outer(b, v))
    cdt = np.complex128 if cfg.dtype == "float64" else np.complex64
    return W0.astype(cdt), W1.astype(cdt)


def split_solution(cfg: SFFTConfig, solution: jnp.ndarray):
    a_ijab = solution[: cfg.Fijab].reshape(cfg.Fij, cfg.L0, cfg.L1)
    b_pq = solution[cfg.Fijab :]
    return a_ijab, b_pq


def standard_kernel_coeffs(cfg: SFFTConfig, a_ijab: jnp.ndarray) -> jnp.ndarray:
    """delta-basis -> standard Cartesian-basis kernel coefficients:
    center pixel becomes 2*a_00 - sum(a) (sfft/utils/SFFTSolutionReader.py:102-114)."""
    s = jnp.sum(a_ijab, axis=(1, 2))
    center = 2.0 * a_ijab[:, cfg.w0, cfg.w1] - s
    return a_ijab.at[:, cfg.w0, cfg.w1].set(center)


def fdiff_fft(
    cfg: SFFTConfig,
    solution: jnp.ndarray,
    SI: jnp.ndarray,
    ST: jnp.ndarray,
    J: jnp.ndarray,
    SSc: jnp.ndarray = None,
) -> jnp.ndarray:
    """Fourier-space difference: D = irfft2(FJ - sum_ij K_ij . FI_ij - sum b FT).

    SSc: scaling-weighted planes (SEPARATE-VARYING); the center-offset dofs
    apply to them instead of SI (reference Construct_FDIFF SEPARATE-VARYING
    variant, sfft/BSplineSFFT.py:2430-2528). The non-center kernel spectrum is
    built center-zeroed; the center contribution is a flat SCALE * a00 factor
    on the sigma planes (equivalent to the reference's per-pixel branch)."""
    N0, N1 = cfg.N0, cfg.N1
    a_ijab, b_pq = split_solution(cfg, solution)
    W0, W1 = _phase_matrices(cfg, half=True)
    W0 = jnp.asarray(W0)
    W1 = jnp.asarray(W1)
    cdt = W0.dtype

    stack = jnp.concatenate([J[None], SI, ST], axis=0)
    specs = jnp.fft.rfft2(stack)
    FJ = specs[0]
    FI = specs[1 : 1 + cfg.Fij]
    FT = specs[1 + cfg.Fij :]

    a00 = a_ijab[:, cfg.w0, cfg.w1]
    Ap = a_ijab.at[:, cfg.w0, cfg.w1].set(0.0).astype(cdt)
    # K'_ij[u, v] = (W0 @ A'_ij @ W1)[u, v]  (center-zeroed kernel spectrum)
    K = jnp.einsum("ua,iab,bv->iuv", W0, Ap, W1, precision=lax.Precision.HIGHEST)
    s_nc = jnp.sum(a_ijab, axis=(1, 2)) - a00
    factor = cfg.SCALE * (K - s_nc.astype(cdt)[:, None, None])

    model = jnp.sum(factor * FI, axis=0) + jnp.tensordot(b_pq.astype(cdt), FT, axes=(0, 0))
    if SSc is None:
        model = model + cfg.SCALE * jnp.tensordot(a00.astype(cdt), FI, axes=(0, 0))
    else:
        FS = jnp.fft.rfft2(SSc)
        model = model + cfg.SCALE * jnp.tensordot(a00.astype(cdt), FS, axes=(0, 0))
    FDIFF = FJ - model
    return jnp.fft.irfft2(FDIFF, s=(N0, N1)).astype(J.dtype)


def fdiff_conv(
    cfg: SFFTConfig,
    solution: jnp.ndarray,
    SI: jnp.ndarray,
    ST: jnp.ndarray,
    J: jnp.ndarray,
    SSc: jnp.ndarray = None,
) -> jnp.ndarray:
    """Real-space circular-convolution difference (complex-free, f64-on-TPU)."""
    a_ijab, b_pq = split_solution(cfg, solution)
    if SSc is not None:
        # SEPARATE-VARYING: non-center offsets act on SI with an effective
        # center -(sum - a00); the a00 dofs act flat on the sigma planes.
        a00 = a_ijab[:, cfg.w0, cfg.w1]
        Astd = a_ijab.at[:, cfg.w0, cfg.w1].set(
            -(jnp.sum(a_ijab, axis=(1, 2)) - a00)
        )
        extra = cfg.SCALE * jnp.tensordot(a00, SSc, axes=(0, 0))
    else:
        Astd = standard_kernel_coeffs(cfg, a_ijab)
        extra = 0.0
    w0, w1 = cfg.w0, cfg.w1
    # circular convolution: out[x] = sum_ab k[a, b] * in[x - a, y - b]
    # lax.conv computes correlation, so flip the kernel.
    kflip = Astd[:, ::-1, ::-1]
    SIpad = jnp.pad(SI, ((0, 0), (w0, w0), (w1, w1)), mode="wrap")
    conv = lax.conv_general_dilated(
        SIpad[None],  # (1, Fij, H, W)
        kflip[:, None],  # (Fij, 1, L0, L1)
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=cfg.Fij,
        precision=lax.Precision.HIGHEST,
    )[0]
    model = (
        cfg.SCALE * jnp.sum(conv, axis=0)
        + jnp.tensordot(b_pq, ST, axes=(0, 0))
        + extra
    )
    return J - model


def fdiff(cfg: SFFTConfig, solution, SI, ST, J, SSc=None) -> jnp.ndarray:
    if cfg.fdiff_backend == "fft":
        return fdiff_fft(cfg, solution, SI, ST, J, SSc)
    if cfg.fdiff_backend == "conv":
        return fdiff_conv(cfg, solution, SI, ST, J, SSc)
    if cfg.fdiff_backend == "fft32":
        # float32/complex64 compute (the only fast FFT on TPU), float64-held
        # solution. Absolute error ~1e-7 * |J| — far below the pixel noise for
        # astronomical data; the exact path is fdiff_fft on CPU.
        import dataclasses

        cfg32 = dataclasses.replace(cfg, dtype="float32", fdiff_backend="fft")
        out = fdiff_fft(
            cfg32,
            solution.astype(jnp.float32),
            SI.astype(jnp.float32),
            ST.astype(jnp.float32),
            J.astype(jnp.float32),
            None if SSc is None else SSc.astype(jnp.float32),
        )
        return out.astype(J.dtype)
    raise ValueError(f"unknown fdiff backend {cfg.fdiff_backend!r}")
