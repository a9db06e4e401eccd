"""Kernel circular-shift/zero-pad (CSZ) conversions and FFT convolution.

Reference: sfft/utils/ConvKernelConvertion.py and sfft/utils/PureCupyFFTKits.py
(KERNEL_CSZ / KERNEL_CSZ_INV / FFT_CONVOLVE). Works on numpy or jax arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def kernel_csz(kernel, N0: int, N1: int, normalize: bool = False):
    """Tail-zero-pad a small (odd) kernel to image size and circular-shift its
    center to pixel (0, 0) so fft2(kernel_csz) is the convolution transfer
    function."""
    xp = _ns(kernel)
    L0, L1 = kernel.shape
    assert L0 % 2 == 1 and L1 % 2 == 1
    w0, w1 = (L0 - 1) // 2, (L1 - 1) // 2
    k = kernel / xp.sum(kernel) if normalize else kernel
    padded = xp.pad(k, ((0, N0 - L0), (0, N1 - L1)), mode="constant")
    return xp.roll(xp.roll(padded, -w0, axis=0), -w1, axis=1)


def kernel_csz_inv(kimg, L0: int, L1: int, verbose: bool = False):
    """Inverse: circular-shift back and truncate to (L0, L1). Returns
    (kernel, lost_weight) where lost_weight is the absolute-weight fraction
    dropped by truncation."""
    xp = _ns(kimg)
    assert L0 % 2 == 1 and L1 % 2 == 1
    w0, w1 = (L0 - 1) // 2, (L1 - 1) // 2
    shifted = xp.roll(xp.roll(kimg, w1, axis=1), w0, axis=0)
    kernel = shifted[:L0, :L1]
    lost = 1.0 - xp.sum(xp.abs(kernel)) / xp.sum(xp.abs(shifted))
    if verbose:
        print(f"MeLOn CheckPoint: Kernel Truncation Loses APE = [{float(lost)*100:.4f} %]")
    return kernel, lost


def fft_convolve(
    image,
    kernel,
    pad_fill_value: float = 0.0,
    nan_fill_value: Optional[float] = 0.0,
    normalize_kernel: bool = False,
):
    """Zero-padded FFT convolution (reference PureCupy_FFTKits.FFT_CONVOLVE):
    pads by the kernel half-width so the circular wrap never touches data,
    convolves in Fourier space, crops back."""
    xp = _ns(image)
    N0, N1 = image.shape
    L0, L1 = kernel.shape
    assert L0 % 2 == 1 and L1 % 2 == 1
    w0, w1 = (L0 - 1) // 2, (L1 - 1) // 2

    ximg = xp.pad(image, ((w0, w0), (w1, w1)), mode="constant",
                  constant_values=pad_fill_value)
    if nan_fill_value is not None:
        ximg = xp.where(xp.isnan(ximg), nan_fill_value, ximg)
    kimg = kernel_csz(kernel, N0 + 2 * w0, N1 + 2 * w1, normalize=normalize_kernel)
    if xp is np:
        out = np.fft.irfft2(np.fft.rfft2(ximg) * np.fft.rfft2(kimg), s=ximg.shape)
    else:
        import jax.numpy as jnp

        out = jnp.fft.irfft2(jnp.fft.rfft2(ximg) * jnp.fft.rfft2(kimg), s=ximg.shape)
    return out[w0:-w0 if w0 else None, w1:-w1 if w1 else None]


def _ns(arr):
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp
