"""Image IO: float [H, W, 3] arrays <-> PNG files.

Replaces the missing framework ``Image`` class of the reference (resize /
pixel access / PNG writer — evidence: mytracer.cpp:131,155, outputs/*.png).
Uses PIL when available, with a pure zlib fallback encoder so the package
has no hard imaging dependency.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """Clamp float [0,1] image to uint8."""
    arr = np.asarray(img, dtype=np.float32)
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray) -> None:
    """Write a float [H, W, 3] (or uint8) image to a PNG file."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    try:
        from PIL import Image as PILImage

        PILImage.fromarray(arr, mode="RGB").save(path)
        return
    except ImportError:
        pass
    _write_png_zlib(path, arr)


def read_png(path: str) -> np.ndarray:
    """Read a PNG file into a float32 [H, W, 3] array in [0, 1]."""
    from PIL import Image as PILImage

    with PILImage.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def _write_png_zlib(path: str, arr: np.ndarray) -> None:
    """Minimal dependency-free RGB8 PNG encoder."""
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        out = struct.pack(">I", len(data)) + tag + data
        return out + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)
