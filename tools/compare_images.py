#!/usr/bin/env python3
"""Golden-image comparison harness.

Companion to the headless CLI contract (the reference's de-facto
integration test: --noWindow --screenshotFrameIndex render -> compare,
SURVEY.md section 4.2): compares two renders (PNG or HDR .npy) with
MSE / PSNR / SMAPE and exits nonzero past the threshold.

Usage:
  python tools/compare_images.py a.png b.png --max-smape 0.05
"""
import argparse
import sys

import numpy as np


def load(path):
    if path.endswith(".npy"):
        return np.load(path).astype(np.float64)
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB")).astype(
        np.float64) / 255.0


def compare(a, b) -> dict:
    """MSE / PSNR / SMAPE between two (H,W,3) float images."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    mse = float(np.mean((a - b) ** 2))
    peak = max(a.max(), b.max(), 1e-9)
    psnr = float(10.0 * np.log10(peak * peak / max(mse, 1e-20)))
    smape = float(np.mean(np.abs(a - b) / (np.abs(a) + np.abs(b) + 1e-3)))
    return dict(mse=mse, psnr=psnr, smape=smape)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--max-smape", type=float, default=None,
                    help="fail if mean SMAPE exceeds this")
    ap.add_argument("--min-psnr", type=float, default=None)
    args = ap.parse_args(argv)
    a, b = load(args.a), load(args.b)
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}")
        return 1
    m = compare(a, b)
    mse, psnr, smape = m["mse"], m["psnr"], m["smape"]
    print(f"mse={mse:.6g} psnr={psnr:.2f}dB smape={smape:.4f}")
    ok = True
    if args.max_smape is not None and smape > args.max_smape:
        print(f"FAIL: smape {smape:.4f} > {args.max_smape}")
        ok = False
    if args.min_psnr is not None and psnr < args.min_psnr:
        print(f"FAIL: psnr {psnr:.2f} < {args.min_psnr}")
        ok = False
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
