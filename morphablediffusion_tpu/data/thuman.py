"""THuman 2.1 dataset (orthographic, SMPL-X body meshes).

Parity target: ldm/data/thuman.py — 16 fixed orthographic target views with
shared cameras from assets/thuman_meta.pkl (:68), random input view with
per-scan meta.pkl (:85-90), SMPL-X vertices from mesh_smplx.obj with the
pre-526 Blender axis rotation (:91-94) and per-scan scale/offset
normalization (:100-103). Splits: train 0-2200, val 2201-2444 (:140-141).
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, List

import numpy as np

from morphablediffusion_tpu.data.common import load_rgba_white, pad_vertices
from morphablediffusion_tpu.utils.mesh_io import load_mesh_vertices, read_pickle

ROT_BLENDER = np.asarray(
    [[1, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=np.float64
)  # thuman.py:94, applied to scans with uid < 526


def train_val_uids():
    return list(range(2201)), list(range(2201, 2445))


class THumanDataset:
    def __init__(
        self,
        data_dir: str,
        smplx_dir: str,
        uids: List[int],
        image_size: int = 256,
        num_views: int = 16,
        max_vertices: int = 10496,
        meta_pkl: str = "./assets/thuman_meta.pkl",
        seed: int = 0,
        max_retries: int = 32,
    ):
        self.data_dir = Path(data_dir)
        self.smplx_dir = Path(smplx_dir)
        self.uids = list(uids)
        self.image_size = image_size
        self.num_views = num_views
        self.max_vertices = max_vertices
        self.rng = random.Random(seed)
        self.max_retries = max_retries
        # shared orthographic target cameras: (K, azs, els, dists, poses)
        K, _, _, _, poses = read_pickle(meta_pkl)
        self.target_K = np.asarray(K, dtype=np.float32)
        self.target_poses = np.asarray(poses, dtype=np.float32)

    def __len__(self):
        return len(self.uids)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        last_err = None
        for _ in range(self.max_retries):
            try:
                return self._item(self.uids[index])
            except Exception as e:
                last_err = e
                index = self.rng.randrange(len(self.uids))
        raise RuntimeError(f"thuman: {self.max_retries} retries failed") from last_err

    def _pad_K(self, K) -> np.ndarray:
        K4 = np.eye(4, dtype=np.float32)
        K = np.asarray(K, dtype=np.float32)
        K4[: K.shape[0], : K.shape[1]] = K
        return K4

    def _item(self, uid_int: int) -> Dict[str, np.ndarray]:
        uid = str(uid_int).zfill(4)
        views = list(range(self.num_views))
        self.rng.shuffle(views)

        imgs, Ks, RTs = [], [], []
        for v in views:
            imgs.append(
                load_rgba_white(
                    self.data_dir / "target" / uid / f"{str(v).zfill(3)}.png",
                    self.image_size,
                )
            )
            Ks.append(self._pad_K(self.target_K))
            RTs.append(np.asarray(self.target_poses[v], np.float32)[:3])

        input_view = self.rng.randint(0, self.num_views - 1)
        input_img = load_rgba_white(
            self.data_dir / "input" / uid / f"{str(input_view).zfill(3)}.png",
            self.image_size,
        )
        input_K, _, _, _, input_poses = read_pickle(
            self.data_dir / "input" / uid / "meta.pkl"
        )
        input_RT = np.asarray(input_poses[input_view], np.float32)[:3]

        rot = np.eye(3) if uid_int >= 526 else ROT_BLENDER
        v = load_mesh_vertices(self.smplx_dir / uid / "mesh_smplx.obj")
        v = (rot @ v.T).T
        norm = np.asarray(
            np.load(self.data_dir / "normalization" / f"{uid}.npy", allow_pickle=True),
            dtype=np.float32,
        )
        v = v * norm[0] + norm[1:]  # thuman.py:103
        verts, mask = pad_vertices(v.astype(np.float32), self.max_vertices)

        N = self.num_views
        return {
            "target_image": np.stack(imgs).astype(np.float32),
            "input_image": input_img,
            "input_elevation": np.zeros((1,), np.float32),
            "input_azimuth": np.zeros((1,), np.float32),
            "target_elevation": np.zeros((N,), np.float32),
            "target_azimuth": np.zeros((N,), np.float32),
            "input_K": self._pad_K(input_K),
            "input_RT": input_RT,
            "target_K": np.stack(Ks),
            "target_RT": np.stack(RTs),
            "vertices": verts,
            "vertex_mask": mask,
        }
