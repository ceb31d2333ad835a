"""Waymo Open Dataset semantic segmentation reader (23 classes).

The reference's Waymo support is the instance-DB builder driven by
pre-extracted keyframe files (``prepare_waymo_inst_database.py:53-80``;
its dataset variants are commented out of the builder, SURVEY §2.2). This
reader consumes the same pre-extracted format: a ``keyframes.txt`` listing
``.npy`` frames with columns [x, y, z, intensity, sem_label, pano_label]
(extraction from TFRecords happens offline — the waymo-open-dataset package
is not available here), and feeds the standard padded pipeline.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from u2mkd_tpu.data import transforms

WAYMO_CLASS_NAMES_23 = [
    "undefined", "car", "truck", "bus", "other_vehicle", "motorcyclist",
    "bicyclist", "pedestrian", "sign", "traffic_light", "pole",
    "construction_cone", "bicycle", "motorcycle", "building", "vegetation",
    "tree_trunk", "curb", "road", "lane_marker", "other_ground", "walkable",
    "sidewalk",
]


class WaymoSeg:
    def __init__(
        self,
        root: str,
        voxel_size: float,
        capacity: int,
        split: str = "train",
        flip_aug: bool = True,
        rotate_aug: bool = True,
        translate_std=None,
        inst_augmenter=None,
        seed: int = 0,
        val_fraction: float = 0.15,
        tta: bool = False,
    ):
        self.root = root
        self.voxel_size = voxel_size
        self.capacity = capacity
        self.train = split == "train"
        # tta: fresh flip/rotate-scale per val pass (multi-vote evaluation),
        # same semantics as the nuScenes/KITTI datasets
        self.tta = tta and not self.train
        aug_on = self.train or self.tta
        self.flip_aug = flip_aug and aug_on
        self.rotate_aug = rotate_aug and aug_on
        self.translate_std = translate_std if self.train else None
        self.inst_augmenter = inst_augmenter if self.train else None
        self.rng = np.random.RandomState(seed)
        with open(os.path.join(root, "keyframes.txt")) as f:
            frames = [l for l in f.read().splitlines() if l]
        # waymo normally ships separate train/val directories; this
        # single-dir fallback splits by NAME HASH so a frame's membership
        # is stable when keyframes.txt grows (a positional stride would
        # silently move previously-trained frames into val)
        if split in ("train", "val"):
            import hashlib

            def bucket(name):
                return int(hashlib.md5(name.encode()).hexdigest(), 16) % 100

            thr = int(round(val_fraction * 100))
            frames = [f for f in frames
                      if (bucket(f) < thr) == (split == "val")]
        self.frames = frames

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, index: int):
        arr = np.load(os.path.join(self.root, self.frames[index]))
        pts = arr[:, :4].astype(np.float32)
        labels = arr[:, 4].astype(np.int32)
        if self.inst_augmenter is not None:
            xyz, labels, inten = self.inst_augmenter.inst_aug(
                pts[:, :3], labels, pts[:, 3]
            )
            pts = np.concatenate([xyz, inten], axis=1)
        xyz = pts[:, :3]
        if self.flip_aug:
            xyz = transforms.random_flip(xyz, self.rng)
        xyz, _, _ = transforms.random_rotate_scale(xyz, self.rng, self.rotate_aug)
        if self.translate_std:
            xyz = transforms.random_translate(xyz, self.translate_std, self.rng)
        feed, info = transforms.build_feed(
            xyz, pts[:, 3], labels, np.ones(len(pts), bool),
            self.voxel_size, self.capacity,
        )
        feed["info"] = info
        return feed
