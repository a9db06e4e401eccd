"""Minimal FITS I/O: round-trip and reading the reference-bundled data."""

import os

import numpy as np
import pytest

from sfft_tpu.io import fits

NIRCAM = (
    "/root/reference/test/subtract_test_nircam/input_data/"
    "jw01324001001-01324-o001_t001_nircam_clear-f200w_i2d_stamp.fits"
)
DECORR = (
    "/root/reference/test/difference_noise_decorrelation/input_data/"
    "DEC-OBS04b.MatchKernel.fits"
)


@pytest.mark.parametrize("dtype", [np.float64, np.float32, np.int16, np.int32])
def test_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(3)
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(0, 100, (13, 7)).astype(dtype)
    else:
        data = rng.integers(-1000, 1000, (13, 7)).astype(dtype)
    path = str(tmp_path / "x.fits")
    hdr = fits.Header()
    hdr.add("KERHW", 8, "MeLOn: SFFT")
    hdr.add("CONVD", "REF", "MeLOn: SFFT")
    hdr.add("GAIN", 1.5, "e-/ADU")
    fits.write(path, data, hdr)
    out, ohdr = fits.read(path)
    assert out.dtype == dtype
    np.testing.assert_array_equal(out, data)
    assert ohdr["KERHW"] == 8
    assert ohdr["CONVD"] == "REF"
    assert abs(ohdr["GAIN"] - 1.5) < 1e-12


@pytest.mark.skipif(not os.path.exists(NIRCAM), reason="reference data absent")
def test_read_reference_nircam():
    data, hdr = fits.read(NIRCAM)
    assert data.ndim == 2
    assert data.shape[0] > 100 and data.shape[1] > 100
    assert np.isfinite(data).any()


@pytest.mark.skipif(not os.path.exists(DECORR), reason="reference data absent")
def test_read_reference_kernel():
    data, hdr = fits.read(DECORR)
    assert data.ndim == 2
    # match kernels are small and roughly unit-sum
    assert max(data.shape) < 100
    assert 0.1 < np.nansum(data) < 10.0
