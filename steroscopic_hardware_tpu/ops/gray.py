"""Exact integer grayscale conversion (reference bit-contract).

The reference's live path decodes PNGs with Go ``image/png`` and converts to
gray in ``pkg/despair/gray.go``:

* 8-bit gray PNGs        -> byte copy                       (``gray.go:15-17``)
* RGBA PNGs (type 6)     -> Go decodes to *image.NRGBA*, taking the generic
  16-bit path (``gray.go:43-58``): channels are expanded to 16 bit
  (``v16 = v8 * 0x101``), alpha-premultiplied, then
  ``gray = uint8((19595*r + 38470*g + 7471*b + 1<<15) >> 24)``.
* RGB PNGs (type 2)      -> Go decodes to *image.RGBA* and hits
  ``convertRGBAToGray`` (``gray.go:20-40``) which applies the same ``>>24``
  shift to *8-bit* channels — always yielding 0. That is a reference bug
  (the formula is calibrated for 16-bit values); per the bit-consistency
  contract we target the per-pixel algorithm, not artifacts, so RGB inputs
  take the correct 16-bit formula here.

``to_grayscale`` reproduces the 16-bit formula exactly for every color
input, and the byte copy for gray inputs.
"""

from __future__ import annotations

import numpy as np

# Integer luma coefficients (sum to 65536), from pkg/despair/gray.go:35-37,52-55.
_CR, _CG, _CB = 19595, 38470, 7471


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """Convert a decoded image array to uint8 grayscale, bit-exact with the
    reference's live (NRGBA/generic) conversion path.

    Accepts (H, W) gray [uint8/uint16], (H, W, 2) gray+alpha,
    (H, W, 3) RGB, or (H, W, 4) RGBA arrays.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        if img.dtype == np.uint16:
            # Go Gray16 via the generic path: r=g=b=v16.
            v = img.astype(np.uint32)
            return (((_CR + _CG + _CB) * v + (1 << 15)) >> 24).astype(np.uint8)
        return img.astype(np.uint8, copy=False)
    if img.ndim != 3:
        raise ValueError(f"unsupported image shape {img.shape}")

    nchan = img.shape[2]
    if img.dtype == np.uint8:
        up = img.astype(np.uint32) * 0x101  # 8 -> 16 bit expansion
    else:
        up = img.astype(np.uint32)

    if nchan == 2:  # gray + alpha (NRGBA-style premultiply, 8-bit alpha)
        a8 = (img[..., 1].astype(np.uint32)
              if img.dtype == np.uint8 else (up[..., 1] >> 8))
        v = up[..., 0] * a8 // 0xFF
        acc = (_CR + _CG + _CB) * v.astype(np.uint64) + (1 << 15)
        return ((acc >> 24) & 0xFF).astype(np.uint8)

    r, g, b = up[..., 0], up[..., 1], up[..., 2]
    if nchan == 4:
        # Go NRGBA.RGBA(): premultiply 16-bit channels by 8-bit alpha.
        a8 = (img[..., 3].astype(np.uint32)
              if img.dtype == np.uint8 else (up[..., 3] >> 8))
        r = r * a8 // 0xFF
        g = g * a8 // 0xFF
        b = b * a8 // 0xFF
    acc = _CR * r.astype(np.uint64) + _CG * g + _CB * b + (1 << 15)
    return ((acc >> 24) & 0xFF).astype(np.uint8)


def load_gray(path) -> np.ndarray:
    """LoadPNG equivalent (pkg/despair/png.go:10-38): decode + to-gray."""
    from steroscopic_hardware_tpu.io.png import read_png

    return to_grayscale(read_png(path))
