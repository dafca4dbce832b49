"""GTA5 (and Synscapes-layout) source-domain dataset.

Reference: dataset/gta5_dataset.py (C8). Directory layout:
    <root>/images/<name>   RGB frames
    <root>/labels/<name>   raw-id label PNGs
with `list_path` a text file of names, one per line. The list is repeated to
cover `max_iters` samples (reference :24-25).

Returns (image HWC f32 BGR-mean-subtracted, label HW f32 train-ids,
size (h, w, c), name) per item, mirroring the reference 4-tuple (:71).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from adaptsegnet_tpu.data import preprocessing as pp


class GTA5Dataset:
    def __init__(
        self,
        root: str,
        list_path: str,
        max_iters: int | None = None,
        crop_size: tuple[int, int] = (321, 321),  # (W, H), torch-style
        mean: np.ndarray = pp.IMG_MEAN_BGR,
        scale: bool = False,
        mirror: bool = False,
        ignore_label: int = 255,
        seed: int = 1338,
    ):
        self.root = root
        self.crop_size = crop_size
        self.mean = np.asarray(mean, np.float32)
        self.scale = scale
        self.mirror = mirror
        self.ignore_label = ignore_label
        self._rng = np.random.default_rng(seed)
        with open(list_path) as f:
            self.img_ids = [line.strip() for line in f if line.strip()]
        if max_iters is not None:
            reps = int(np.ceil(float(max_iters) / len(self.img_ids)))
            self.img_ids = self.img_ids * reps
        self.files = [
            {
                "img": osp.join(root, "images", name),
                "label": osp.join(root, "labels", name),
                "name": name,
            }
            for name in self.img_ids
        ]

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int):
        entry = self.files[index]
        crop = self.crop_size
        if self.scale:
            # Opt-in random scale jitter (reference flag is dead; see
            # preprocessing.random_mirror note). Scales crop by [0.75, 1.25].
            f = float(self._rng.uniform(0.75, 1.25))
            crop = (max(1, int(crop[0] * f)), max(1, int(crop[1] * f)))
        image = pp.load_image(entry["img"], crop)
        label = pp.load_label(entry["label"], crop)
        label = pp.remap_gta5_labels(label)
        image = pp.preprocess_image(image, self.mean)
        if self.mirror:
            image, label = pp.random_mirror([image, label], self._rng)
        size = np.array(image.shape, dtype=np.int64)
        return image, label, size, entry["name"]
