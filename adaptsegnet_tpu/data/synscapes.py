"""Synscapes source-domain dataset (Synscapes -> Cityscapes adaptation).

The reference README points to Synscapes experiments (README.md:53-55,
"Synscapes2Cityscapes" in the updated arXiv appendix) but ships no loader
(the dataset/ package is gitignored). Synscapes (arXiv:1810.08705) uses
Cityscapes class ids directly, laid out as:
    <root>/img/rgb/<n>.png     RGB frames
    <root>/img/class/<n>.png   label PNGs with Cityscapes RAW ids

Pipeline matches GTA5Dataset (bicubic/nearest resize, BGR mean subtraction,
raw-id -> train-id remap — the same 19-class table applies since Synscapes
uses Cityscapes ids).
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from adaptsegnet_tpu.data import preprocessing as pp


class SynscapesDataset:
    def __init__(
        self,
        root: str,
        list_path: str | None = None,
        max_iters: int | None = None,
        crop_size: tuple[int, int] = (1024, 512),  # (W, H)
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
        if list_path:
            with open(list_path) as f:
                self.img_ids = [line.strip() for line in f if line.strip()]
        else:
            self.img_ids = sorted(
                n for n in os.listdir(osp.join(root, "img", "rgb"))
                if n.endswith(".png")
            )
        if max_iters is not None:
            reps = int(np.ceil(float(max_iters) / len(self.img_ids)))
            self.img_ids = self.img_ids * reps
        self.files = [
            {
                "img": osp.join(root, "img", "rgb", name),
                "label": osp.join(root, "img", "class", name),
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
            f = float(self._rng.uniform(0.75, 1.25))
            crop = (max(1, int(crop[0] * f)), max(1, int(crop[1] * f)))
        image = pp.load_image(entry["img"], crop)
        label = pp.load_label(entry["label"], crop)
        label = pp.remap_gta5_labels(label)  # Cityscapes raw ids -> train ids
        image = pp.preprocess_image(image, self.mean)
        if self.mirror:
            image, label = pp.random_mirror([image, label], self._rng)
        size = np.array(image.shape, dtype=np.int64)
        return image, label, size, entry["name"]
