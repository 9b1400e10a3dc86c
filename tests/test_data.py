"""Data pipeline tests against synthetic on-disk fixtures."""

import json
import pickle

import numpy as np
import pytest
from PIL import Image

from morphablediffusion_tpu.data.common import BATCH_KEYS, load_rgba_white
from morphablediffusion_tpu.data.facescape import FaceScapeDataset, train_val_uids
from morphablediffusion_tpu.data.loader import PrefetchLoader
from morphablediffusion_tpu.data.thuman import THumanDataset


def _write_rgba(path, size=32, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (size, size, 4), dtype=np.uint8)
    img[..., 3] = 255
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(img, "RGBA").save(path)


def _write_obj(path, n=12, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.uniform(-0.1, 0.1, (n, 3))
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for x, y, z in v:
            f.write(f"v {x} {y} {z}\n")


@pytest.fixture
def facescape_root(tmp_path):
    root = tmp_path / "facescape"
    flame = tmp_path / "flame_assets"
    subjects = ["001", "002"]
    exps = ["01", "02"]
    n_views = 6
    for s in subjects:
        for e in exps:
            d = root / s / e
            cams = {}
            for v in range(n_views):
                _write_rgba(d / f"view_{str(v).zfill(5)}" / "rgba_colorcalib.png",
                            seed=v)
                az = (v - n_views / 2) * 20
                cams[str(v)] = {
                    "intrinsics": [[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]],
                    "extrinsics": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 1.5]],
                    "angles": {"azimuth": az, "elevation": 0.0},
                }
            (d / "cameras.json").write_text(json.dumps(cams))
            _write_obj(flame / s / e / "mesh.obj")
    return root, flame


def test_facescape_splits():
    train, val = train_val_uids()
    assert len(train) == 323 * 19
    assert len(val) == 36
    assert "122/01" not in train
    assert all(u.endswith("/06") for u in val)


def test_facescape_item(facescape_root):
    root, flame = facescape_root
    ds = FaceScapeDataset(
        str(root), uids=["001/01", "002/02"], image_size=32, num_views=4,
        max_vertices=16, flame_assets_dir=str(flame), shuffled_expression=True,
    )
    item = ds[0]
    assert set(item.keys()) == set(BATCH_KEYS)
    assert item["target_image"].shape == (4, 32, 32, 3)
    assert item["input_image"].shape == (32, 32, 3)
    assert item["target_K"].shape == (4, 4, 4)
    assert item["target_RT"].shape == (4, 3, 4)
    assert item["vertices"].shape == (16, 3)
    assert item["vertex_mask"].sum() == 12
    assert -1.0 <= item["target_image"].min() <= item["target_image"].max() <= 1.0
    # world scale 2.5 applied to camera translation
    assert abs(item["target_RT"][0, 2, 3] - 1.5 * 2.5) < 1e-5


def test_facescape_retry_on_missing(facescape_root):
    root, flame = facescape_root
    ds = FaceScapeDataset(
        str(root), uids=["099/01", "001/01"], image_size=32, num_views=4,
        max_vertices=16, flame_assets_dir=str(flame),
    )
    item = ds[0]  # falls back to a valid random uid
    assert item["target_image"].shape == (4, 32, 32, 3)


def test_prefetch_loader(facescape_root):
    root, flame = facescape_root
    ds = FaceScapeDataset(
        str(root), uids=["001/01", "001/02", "002/01", "002/02"],
        image_size=32, num_views=4, max_vertices=16, flame_assets_dir=str(flame),
    )
    loader = PrefetchLoader(ds, batch_size=2, num_workers=2, prefetch=1)
    it = iter(loader)
    b1 = next(it)
    b2 = next(it)
    assert b1["target_image"].shape == (2, 4, 32, 32, 3)
    assert b2["vertices"].shape == (2, 16, 3)


def test_prefetch_loader_host_sharding(facescape_root):
    root, flame = facescape_root
    ds = FaceScapeDataset(
        str(root), uids=["001/01", "001/02", "002/01", "002/02"],
        image_size=32, num_views=4, max_vertices=16, flame_assets_dir=str(flame),
    )
    l0 = PrefetchLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                        process_index=0, process_count=2)
    l1 = PrefetchLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                        process_index=1, process_count=2)
    assert list(l0._epoch_indices(0)) == [0, 2]
    assert list(l1._epoch_indices(0)) == [1, 3]


@pytest.fixture
def thuman_root(tmp_path):
    root = tmp_path / "thuman"
    smplx = tmp_path / "smplx"
    uid = "0001"
    K = np.asarray([[1 / 0.6, 0, 0], [0, 1 / 0.6, 0], [0, 0, 1]], np.float32)
    poses = np.stack(
        [np.concatenate([np.eye(3), [[0], [0], [1.5]]], 1) for _ in range(16)]
    ).astype(np.float32)
    meta = (K, np.zeros(16), np.zeros(16), np.zeros(16), poses)
    assets = tmp_path / "assets"
    assets.mkdir()
    with open(assets / "thuman_meta.pkl", "wb") as f:
        pickle.dump(meta, f)
    for v in range(16):
        _write_rgba(root / "target" / uid / f"{str(v).zfill(3)}.png", seed=v)
        _write_rgba(root / "input" / uid / f"{str(v).zfill(3)}.png", seed=100 + v)
    (root / "input" / uid / "meta.pkl").write_bytes(pickle.dumps(meta))
    (root / "normalization").mkdir(parents=True)
    np.save(root / "normalization" / f"{uid}.npy",
            np.asarray([0.5, 0.0, 0.1, 0.0], np.float32))
    _write_obj(smplx / uid / "mesh_smplx.obj", n=20)
    return root, smplx, assets / "thuman_meta.pkl"


def test_thuman_item(thuman_root):
    root, smplx, meta = thuman_root
    ds = THumanDataset(
        str(root), str(smplx), uids=[1], image_size=32, num_views=16,
        max_vertices=32, meta_pkl=str(meta),
    )
    item = ds[0]
    assert item["target_image"].shape == (16, 32, 32, 3)
    assert item["target_K"].shape == (16, 4, 4)
    assert item["target_K"][0, 3, 3] == 1.0
    assert item["vertices"].shape == (32, 3)
    assert item["vertex_mask"].sum() == 20
    # normalization applied: v*0.5 + offset(0.0, 0.1, 0.0); uid<526 -> blender rot
    assert np.abs(item["vertices"][:20, 1].mean() - 0.1) < 0.2


def test_loader_thread_lifecycle(facescape_root):
    """One live producer per iterator; close() reclaims it (the train CLI
    reuses a single validation iterator instead of spawning one per val)."""
    import threading
    import time

    root, flame = facescape_root
    ds = FaceScapeDataset(
        str(root), uids=["001/01", "001/02", "002/01", "002/02"],
        image_size=32, num_views=4, max_vertices=16, flame_assets_dir=str(flame),
    )
    loader = PrefetchLoader(ds, batch_size=2, num_workers=1, prefetch=1)

    base = threading.active_count()
    it = iter(loader)
    for _ in range(4):  # repeated pulls from ONE iterator: no thread growth
        next(it)
    during = threading.active_count()
    # producer + its 1-worker pool
    assert during <= base + 2, (base, during)

    it.close()
    deadline = time.time() + 10
    while threading.active_count() > base and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= base, (
        base, threading.active_count(),
    )
