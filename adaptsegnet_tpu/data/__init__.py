"""Data pipeline: GTA5/Synscapes source + Cityscapes target loaders.

Host-side decode keeps exact PIL semantics (bicubic image / nearest label
resize, BGR channel order, Caffe mean subtraction — reference
dataset/gta5_dataset.py:47-71); batches stream to device HBM through a
double-buffered prefetcher (data/pipeline.py) instead of DataLoader worker
processes.
"""

from adaptsegnet_tpu.data.preprocessing import (
    IMG_MEAN_BGR,
    preprocess_image,
    remap_gta5_labels,
    GTA5_ID_TO_TRAINID,
)
from adaptsegnet_tpu.data.gta5 import GTA5Dataset
from adaptsegnet_tpu.data.synscapes import SynscapesDataset
from adaptsegnet_tpu.data.cityscapes import CityscapesDataset
from adaptsegnet_tpu.data.pipeline import PrefetchIterator, epoch_batches

__all__ = [
    "IMG_MEAN_BGR",
    "preprocess_image",
    "remap_gta5_labels",
    "GTA5_ID_TO_TRAINID",
    "GTA5Dataset",
    "SynscapesDataset",
    "CityscapesDataset",
    "PrefetchIterator",
    "epoch_batches",
]
