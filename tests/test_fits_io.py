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


FZ = ("/root/reference/test/subtract_test_crowded_flavor/TESS-Example/"
      "4check/sfft_diff4check.fits.fz")


@pytest.mark.skipif(not os.path.exists(FZ), reason="fz data absent")
def test_read_fpack_compressed():
    """RICE_1 + SUBTRACTIVE_DITHER_1 tile-compressed image (fpack)."""
    data, hdr = fits.read(FZ, ext=1)
    assert data.shape == (2048, 2048)
    import numpy as np

    finite = np.isfinite(data)
    assert finite.mean() > 0.9
    # a difference image: zero-centered, sane spread
    assert abs(np.nanmedian(data)) < 0.1
    assert 0.1 < np.nanstd(data) < 100.0


@pytest.mark.skipif(not os.path.exists(FZ), reason="fz data absent")
def test_rice_native_matches_python_fallback():
    from sfft_tpu import native

    # grab the first compressed tile stream out of the real file
    raw = open(FZ, "rb").read()
    # header of HDU 1 starts at 2880; find table start
    pos = 2880
    end = False
    while not end:
        block = raw[pos : pos + 2880]
        pos += 2880
        for i in range(0, 2880, 80):
            if block[i : i + 3] == b"END":
                end = True
                break
    table_start = pos
    desc = np.frombuffer(raw[table_start : table_start + 8], dtype=">i4")
    nelem, hoff = int(desc[0]), int(desc[1])
    heap_start = table_start + 24 * 2048
    stream = raw[heap_start + hoff : heap_start + hoff + nelem]

    out_native = native.rice_decode(stream, 2048, 32)
    saved = native._native
    native._native = None
    try:
        out_py = native.rice_decode(stream, 2048, 32)
    finally:
        native._native = saved
    np.testing.assert_array_equal(out_native, out_py)
