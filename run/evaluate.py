"""Metric engine: PSNR/SSIM/RMSE (+LPIPS stub) over rendered-vs-GT images.

Mirrors /root/reference/run/evaluate.py:34-97: per-image metric files
({metric}.txt) and an aggregate scores.txt in the image directory.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgnerf_tpu.utils.metrics import psnr, ssim, rmse, lpips  # noqa: E402


def load_image(path):
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im, dtype=np.float32)[..., :3] / 255.0


DEFAULT_METRICS = ("psnr", "ssim", "lpips", "vgglpips", "rmse")


def report_metrics(gt_dir, img_dir, out_dir, metrics=DEFAULT_METRICS,
                   gt_suffix="-gt_image.png", img_suffix="-coarse_raycolor.png"):
    names = sorted(f[: -len(img_suffix)] for f in os.listdir(img_dir)
                   if f.endswith(img_suffix))
    results = {m: [] for m in metrics}
    lpips_warned = False
    for name in names:
        img = load_image(os.path.join(img_dir, name + img_suffix))
        gt = load_image(os.path.join(gt_dir, name + gt_suffix))
        if img.shape != gt.shape:
            print(f"skip {name}: shape mismatch {img.shape} vs {gt.shape}")
            continue
        for m in metrics:
            fn = {"psnr": psnr, "ssim": ssim, "rmse": rmse}.get(m)
            if fn is None:
                v = lpips(img, gt, net=m.replace("lpips", "") or "alex")
                if v is None and not lpips_warned:
                    lpips_warned = True
                    print("[evaluate] LPIPS weights not found — reporting "
                          "nan (reference: missing lpips package). Provide "
                          "backbone + calibration weights via $SGNERF_LPIPS "
                          "or ~/.cache/torch/hub/checkpoints; see README "
                          "'LPIPS weights'.")
                results[m].append(v if v is not None else float("nan"))
            else:
                results[m].append(fn(img, gt))
    os.makedirs(out_dir, exist_ok=True)
    lines = []
    for m in metrics:
        vals = np.asarray(results[m], dtype=np.float64)
        with open(os.path.join(out_dir, f"{m}.txt"), "w") as f:
            for n, v in zip(names, vals):
                f.write(f"{n} {v:.6f}\n")
        mean = float(np.nanmean(vals)) if len(vals) else float("nan")
        lines.append(f"{m}: {mean:.6f}")
        print(f"{m}: {mean:.6f}")
    with open(os.path.join(out_dir, "scores.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return {m: (float(np.nanmean(np.asarray(v))) if len(v) else float("nan"))
            for m, v in results.items()}


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--metrics", nargs="+", default=list(DEFAULT_METRICS))
    a = ap.parse_args()
    report_metrics(a.gt_dir, a.img_dir, a.out_dir or a.img_dir,
                   tuple(a.metrics))
