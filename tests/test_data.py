"""Data pipeline tests on synthetic fixtures + parity with reference recipe."""

import numpy as np
import pytest
from PIL import Image

from adaptsegnet_tpu.data import (
    GTA5Dataset,
    CityscapesDataset,
    PrefetchIterator,
    IMG_MEAN_BGR,
)
from adaptsegnet_tpu.data.pipeline import stack_collate
from adaptsegnet_tpu.data import lists
from adaptsegnet_tpu.data.preprocessing import (
    GTA5_ID_TO_TRAINID,
    preprocess_image,
    remap_gta5_labels,
)


@pytest.fixture(scope="module")
def gta5_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gta5"))
    list_path = lists.make_synthetic_gta5(root, n=4, size_wh=(64, 32))
    return root, list_path


@pytest.fixture(scope="module")
def cs_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cs"))
    list_path = lists.make_synthetic_cityscapes(root, "train", n=3, size_wh=(64, 32))
    return root, list_path


def test_gta5_item_reference_semantics(gta5_root):
    root, list_path = gta5_root
    ds = GTA5Dataset(root, list_path, crop_size=(32, 16))
    img, lab, size, name = ds[0]
    assert img.shape == (16, 32, 3) and img.dtype == np.float32
    assert lab.shape == (16, 32) and lab.dtype == np.float32
    np.testing.assert_array_equal(size, [16, 32, 3])

    # Recompute with raw PIL to pin the preprocessing chain.
    pil = Image.open(f"{root}/images/{name}").convert("RGB").resize((32, 16), Image.BICUBIC)
    ref = np.asarray(pil, np.float32)[:, :, ::-1] - IMG_MEAN_BGR
    np.testing.assert_allclose(img, ref, atol=1e-5)

    raw = np.asarray(
        Image.open(f"{root}/labels/{name}").resize((32, 16), Image.NEAREST),
        np.float32,
    )
    valid = np.isin(raw, list(GTA5_ID_TO_TRAINID))
    assert np.all(lab[~valid] == 255)
    for k, v in GTA5_ID_TO_TRAINID.items():
        assert np.all(lab[raw == k] == v)


def test_gta5_max_iters_repeats(gta5_root):
    root, list_path = gta5_root
    ds = GTA5Dataset(root, list_path, max_iters=10)
    assert len(ds) == 12  # ceil(10/4)*4


def test_cityscapes_item(cs_root):
    root, list_path = cs_root
    ds = CityscapesDataset(root, list_path, crop_size=(64, 32), set="train")
    img, size, name = ds[0]
    assert img.shape == (32, 64, 3)
    assert name.endswith("_leftImg8bit.png")


def test_prefetch_iterator_batches(gta5_root):
    root, list_path = gta5_root
    ds = GTA5Dataset(root, list_path, crop_size=(32, 16))
    it = PrefetchIterator(
        ds, batch_size=2, collate=stack_collate({0, 1, 2}),
        shuffle=True, max_batches=3,
    )
    batches = list(it)
    it.close()
    assert len(batches) == 3
    img, lab, size, names = batches[0]
    assert img.shape == (2, 16, 32, 3)
    assert lab.shape == (2, 16, 32)
    assert len(names) == 2
    # Device-resident (jax arrays, not numpy).
    assert not isinstance(img, np.ndarray)


def test_devkit_roundtrip(tmp_path):
    devkit = str(tmp_path / "devkit")
    lists.write_devkit(devkit, ["a.png", "b.png"], ["a_gt.png", "b_gt.png"])
    import json

    info = json.load(open(f"{devkit}/info.json"))
    assert info["classes"] == 19
    assert len(info["label"]) == 19
    l2t = dict(map(tuple, info["label2train"]))
    assert l2t[7] == 0 and l2t[33] == 18 and l2t[0] == 255 and l2t[-1] == 255


def test_scan_lists(gta5_root, cs_root):
    assert lists.scan_gta5_list(gta5_root[0]) == [f"{i:05d}.png" for i in range(4)]
    cs = lists.scan_cityscapes_list(cs_root[0], "train")
    assert len(cs) == 3 and cs[0].startswith("synthcity/")


def test_mirror_augmentation(gta5_root):
    root, list_path = gta5_root
    ds = GTA5Dataset(root, list_path, crop_size=(32, 16), mirror=True, seed=0)
    base = GTA5Dataset(root, list_path, crop_size=(32, 16))
    flipped = 0
    for _ in range(20):
        img, _, _, _ = ds[0]
        ref, _, _, _ = base[0]
        if not np.allclose(img, ref):
            np.testing.assert_allclose(img, ref[:, ::-1], atol=1e-5)
            flipped += 1
    assert 0 < flipped < 20
