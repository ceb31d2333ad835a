"""Point-cloud / image visualization utilities.

Equivalent of the reference ``visualize_utils.py`` (open3d interactive
viewer + PIL/matplotlib overlays + cross-dataset label maps). open3d is not
available in this environment, so rendering uses matplotlib (headless-safe
scatter projections) and PIL; the label tables and cross-dataset maps are
kept as data.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

NUSC_CLASS_COLORS = np.array(
    [
        [0, 0, 0], [112, 128, 144], [220, 20, 60], [255, 127, 80],
        [255, 158, 0], [233, 150, 70], [255, 61, 99], [0, 0, 230],
        [47, 79, 79], [255, 140, 0], [255, 99, 71], [0, 207, 191],
        [175, 0, 75], [75, 0, 75], [112, 180, 60], [222, 184, 135],
        [0, 175, 0],
    ],
    np.uint8,
)

# cross-dataset label maps (reference ``visualize_utils.py:164-210``)
MAP_SEMKITTI_TO_NUSC = {
    0: 0, 1: 4, 2: 2, 3: 6, 4: 10, 5: 5, 6: 7, 7: 2, 8: 6, 9: 11, 10: 9,
    11: 13, 12: 12, 13: 15, 14: 15, 15: 16, 16: 14, 17: 14, 18: 15, 19: 16,
}


def save_bev_png(path: str, xyz: np.ndarray, labels: Optional[np.ndarray] = None,
                 extent: float = 50.0, size: int = 800):
    """Rasterize a bird's-eye-view of the cloud to a PNG (PIL only)."""
    from PIL import Image

    img = np.zeros((size, size, 3), np.uint8)
    u = ((xyz[:, 0] + extent) / (2 * extent) * (size - 1)).astype(int)
    v = ((xyz[:, 1] + extent) / (2 * extent) * (size - 1)).astype(int)
    ok = (u >= 0) & (u < size) & (v >= 0) & (v < size)
    if labels is not None:
        colors = NUSC_CLASS_COLORS[np.clip(labels, 0, len(NUSC_CLASS_COLORS) - 1)]
    else:
        z = xyz[:, 2]
        zn = np.clip((z - z.min()) / max(z.ptp(), 1e-6), 0, 1)
        colors = np.stack([(zn * 255)] * 3, -1).astype(np.uint8)
    img[size - 1 - v[ok], u[ok]] = colors[ok]
    Image.fromarray(img).save(path)


def save_projection_overlay(path: str, image: np.ndarray, uv_norm: np.ndarray,
                            mask: np.ndarray, labels: Optional[np.ndarray] = None):
    """Draw projected points over a camera image (uv in [-1,1])."""
    from PIL import Image

    img = np.ascontiguousarray(image.astype(np.uint8))
    h, w = img.shape[:2]
    u = ((uv_norm[:, 0] + 1) / 2 * (w - 1)).astype(int)
    v = ((uv_norm[:, 1] + 1) / 2 * (h - 1)).astype(int)
    ok = mask & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    if labels is not None:
        colors = NUSC_CLASS_COLORS[np.clip(labels, 0, len(NUSC_CLASS_COLORS) - 1)]
    else:
        colors = np.full((len(u), 3), [255, 0, 0], np.uint8)
    img[v[ok], u[ok]] = colors[ok]
    Image.fromarray(img).save(path)


def confusion_matrix(pred: np.ndarray, target: np.ndarray, num_classes: int,
                     ignore_label: int = 0) -> np.ndarray:
    keep = target != ignore_label
    idx = target[keep] * num_classes + pred[keep]
    return np.bincount(idx, minlength=num_classes ** 2).reshape(
        num_classes, num_classes
    )
