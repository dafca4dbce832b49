"""Cityscapes target-domain dataset (reconstructed component C9).

The reference's dataset/cityscapes_dataset.py is gitignored; this rebuild
follows the call-site contract (SURVEY.md §2.1 C9):
  * constructor (root, list_path, max_iters, crop_size, scale, mirror, mean,
    set) — train_gta2cityscapes_multi.py:333-337, evaluate_cityscapes.py:150;
  * images under <root>/leftImg8bit/<set>/<name> (upstream convention);
  * __getitem__ returns the 3-tuple (image, size, name) — unpacked as
    `images, _, _` in training (:418) and `image, _, name` in eval (:158).

No labels here: the target domain is unlabeled during adaptation; ground
truth enters only through compute_iou on saved prediction PNGs.
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from adaptsegnet_tpu.data import preprocessing as pp


class CityscapesDataset:
    def __init__(
        self,
        root: str,
        list_path: str,
        max_iters: int | None = None,
        crop_size: tuple[int, int] = (321, 321),  # (W, H)
        mean: np.ndarray = pp.IMG_MEAN_BGR,
        scale: bool = False,
        mirror: bool = False,
        set: str = "val",
        seed: int = 1338,
    ):
        self.root = root
        self.crop_size = crop_size
        self.mean = np.asarray(mean, np.float32)
        self.mirror = mirror
        self.set = set
        self._rng = np.random.default_rng(seed)
        with open(list_path) as f:
            self.img_ids = [line.strip() for line in f if line.strip()]
        if max_iters is not None:
            reps = int(np.ceil(float(max_iters) / len(self.img_ids)))
            self.img_ids = self.img_ids * reps
        self.files = [
            {"img": osp.join(root, "leftImg8bit", set, name), "name": name}
            for name in self.img_ids
        ]

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int):
        entry = self.files[index]
        image = pp.load_image(entry["img"], self.crop_size)
        image = pp.preprocess_image(image, self.mean)
        if self.mirror:
            (image,) = pp.random_mirror([image], self._rng)
        size = np.array(image.shape, dtype=np.int64)
        return image, size, entry["name"]
