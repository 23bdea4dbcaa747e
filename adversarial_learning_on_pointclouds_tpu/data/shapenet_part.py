"""ShapeNet-part dataset (per-point part segmentation).

Parity with the reference loader (``upstream:dataset.py``, SURVEY.md
§2.1): 16 object categories, 50 part classes; supports both the per-shape
``.pts``/``.seg`` file layout with JSON split files and the HDF5 packaging
(keys ``data`` [S,N,3], ``label`` [S,1] category id, ``pid`` [S,N] part
id). The category -> part-id-range table (``SEG_CLASSES``) is load-bearing
for the instance-mIoU protocol (SURVEY.md §7 hard part #6).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import h5py
import numpy as np

NUM_PARTS = 50
NUM_CATEGORIES = 16

# Canonical category -> part class ids (the standard ShapeNet-part split
# used by the PointNet lineage's seg_classes dict).
SEG_CLASSES: Dict[str, List[int]] = {
    "Airplane": [0, 1, 2, 3],
    "Bag": [4, 5],
    "Cap": [6, 7],
    "Car": [8, 9, 10, 11],
    "Chair": [12, 13, 14, 15],
    "Earphone": [16, 17, 18],
    "Guitar": [19, 20, 21],
    "Knife": [22, 23],
    "Lamp": [24, 25, 26, 27],
    "Laptop": [28, 29],
    "Motorbike": [30, 31, 32, 33, 34, 35],
    "Mug": [36, 37],
    "Pistol": [38, 39, 40],
    "Rocket": [41, 42, 43],
    "Skateboard": [44, 45, 46],
    "Table": [47, 48, 49],
}
CATEGORY_NAMES: List[str] = list(SEG_CLASSES.keys())

# Dense [16, 2] (start, count) table for on-device category-masked ops.
CATEGORY_PART_RANGES = np.array(
    [[parts[0], len(parts)] for parts in SEG_CLASSES.values()],
    dtype=np.int32)


class ShapeNetPart:
    """Host-side reader.

    Attributes: ``points`` [S, N, 3] float32 (pts layout: list of ragged
    arrays), ``part_labels`` [S, N] int32, ``category`` [S] int32.
    """

    def __init__(self, root: str, split: str = "train",
                 class_choice: Optional[str] = None):
        h5s = sorted(
            os.path.join(root, fn) for fn in os.listdir(root)
            if fn.endswith(".h5") and split in fn)
        if h5s:
            datas, pids, cats = [], [], []
            for path in h5s:
                with h5py.File(path, "r") as f:
                    datas.append(np.asarray(f["data"], dtype=np.float32))
                    pids.append(np.asarray(f["pid"], dtype=np.int32))
                    cats.append(np.asarray(f["label"], dtype=np.int32).reshape(-1))
            self.points = np.concatenate(datas, 0)
            self.part_labels = np.concatenate(pids, 0)
            self.category = np.concatenate(cats, 0)
            self._ragged = False
        else:
            self._load_pts_layout(root, split)
        if class_choice is not None:
            cat_id = CATEGORY_NAMES.index(class_choice)
            keep = self.category == cat_id
            self.category = self.category[keep]
            if self._ragged:
                self.points = [p for p, k in zip(self.points, keep) if k]
                self.part_labels = [p for p, k in zip(self.part_labels, keep) if k]
            else:
                self.points = self.points[keep]
                self.part_labels = self.part_labels[keep]

    def _load_pts_layout(self, root: str, split: str) -> None:
        """Per-shape ``<synset>/points/*.pts`` + ``points_label/*.seg`` with
        ``train_test_split/shuffled_{split}_file_list.json`` (reference
        layout)."""
        split_file = os.path.join(
            root, "train_test_split", f"shuffled_{split}_file_list.json")
        cat_file = os.path.join(root, "synsetoffset2category.txt")
        synset_to_cat: Dict[str, int] = {}
        if os.path.exists(cat_file):
            with open(cat_file) as f:
                for line in f:
                    name, synset = line.split()
                    synset_to_cat[synset] = CATEGORY_NAMES.index(name)
        if not os.path.exists(split_file):
            raise FileNotFoundError(
                f"no ShapeNet-part h5 shards or pts layout under {root!r}")
        with open(split_file) as f:
            entries = json.load(f)
        pts_list, seg_list, cats = [], [], []
        for entry in entries:
            # entry like "shape_data/<synset>/<token>"
            _, synset, token = entry.split("/")
            pts = np.loadtxt(
                os.path.join(root, synset, "points", token + ".pts"),
                dtype=np.float32).reshape(-1, 3)
            seg = np.loadtxt(
                os.path.join(root, synset, "points_label", token + ".seg"),
                dtype=np.int32).reshape(-1)
            cat = synset_to_cat.get(synset, 0)
            # .seg files are 1-based within the category; map to global ids.
            seg = CATEGORY_PART_RANGES[cat, 0] + seg - 1
            pts_list.append(pts)
            seg_list.append(seg)
            cats.append(cat)
        self.points = pts_list
        self.part_labels = seg_list
        self.category = np.asarray(cats, dtype=np.int32)
        self._ragged = True

    def __len__(self) -> int:
        return len(self.category)

    def __getitem__(self, i: int):
        return self.points[i], self.part_labels[i], self.category[i]

    def as_arrays(self, num_points: int, seed: int = 0,
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Rectangularize to fixed N (host-side resample-with-replacement,
        matching the reference's ``np.random.choice`` in ``__getitem__``)."""
        if not self._ragged and self.points.shape[1] == num_points:
            return self.points, self.part_labels, self.category
        rng = np.random.default_rng(seed)
        pts = np.empty((len(self), num_points, 3), np.float32)
        seg = np.empty((len(self), num_points), np.int32)
        for i in range(len(self)):
            p = self.points[i]
            idx = rng.choice(len(p), num_points, replace=True)
            pts[i] = p[idx]
            seg[i] = self.part_labels[i][idx]
        return pts, seg, self.category


def make_synthetic_shapenet(root: str, num_shapes: int = 64,
                            num_points: int = 2048, seed: int = 0,
                            layout: str = "h5") -> str:
    """Synthetic ShapeNet-part fixtures (h5 layout by default).

    Part labels are spatially coherent (split along a category-dependent
    axis into that category's parts) so a segmenter can overfit them.
    """
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    cats = rng.integers(0, NUM_CATEGORIES, size=num_shapes).astype(np.int32)
    pts = rng.standard_normal((num_shapes, num_points, 3)).astype(np.float32)
    norm = np.max(np.linalg.norm(pts, axis=-1, keepdims=True), 1, keepdims=True)
    pts /= np.maximum(norm, 1e-12)
    pids = np.empty((num_shapes, num_points), np.int32)
    for i, cat in enumerate(cats):
        start, count = CATEGORY_PART_RANGES[cat]
        axis = int(cat) % 3
        q = np.clip(((pts[i, :, axis] + 1.0) / 2.0 * count).astype(np.int32),
                    0, count - 1)
        pids[i] = start + q
    for split, sl in (("train", slice(0, int(0.75 * num_shapes))),
                      ("val", slice(int(0.75 * num_shapes), int(0.875 * num_shapes))),
                      ("test", slice(int(0.875 * num_shapes), num_shapes))):
        with h5py.File(os.path.join(root, f"ply_data_{split}0.h5"), "w") as f:
            f.create_dataset("data", data=pts[sl])
            f.create_dataset("label", data=cats[sl].reshape(-1, 1))
            f.create_dataset("pid", data=pids[sl])
    return root
