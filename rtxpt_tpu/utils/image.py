"""Image IO (screenshot path of the golden-image harness;
reference: SaveTextureToFile, Sample.cpp:2229)."""
from __future__ import annotations

import numpy as np


def save_png(path: str, srgb01: np.ndarray):
    """srgb01: (H,W,3) float in [0,1]."""
    from PIL import Image
    arr = np.clip(np.asarray(srgb01) * 255.0 + 0.5, 0,
                  255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def encode_png_bytes(srgb01: np.ndarray) -> bytes:
    """srgb01 (H,W,3) float in [0,1] -> PNG bytes (the interactive
    viewer's frame transport)."""
    import io

    from PIL import Image
    arr = np.clip(np.asarray(srgb01) * 255.0 + 0.5, 0,
                  255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def load_png(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB")).astype(
        np.float32) / 255.0


def save_npy(path: str, hdr: np.ndarray):
    np.save(path, np.asarray(hdr, np.float32))
