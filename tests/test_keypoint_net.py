"""Native landmark detector: overfit sanity + CLI round trip.

The in-repo keypoint backend must actually be able to produce PCK: a tiny
training run on synthetic data must drive the detector onto its training
labels (the overfit test), and the train -> detect -> eval_2d PCK pipeline
must run end to end through the CLIs.
"""

import json

import numpy as np
import pytest
from PIL import Image


def _synthetic_faces(rng, n, size):
    """Images with a bright dot per landmark: learnable mapping."""
    kpts = rng.uniform(size * 0.2, size * 0.8, (n, 68, 2)).astype(np.float32)
    imgs = np.zeros((n, size, size, 3), np.float32)
    for i in range(n):
        for k in range(68):
            x, y = kpts[i, k]
            xi, yi = int(x), int(y)
            imgs[i, max(yi - 1, 0) : yi + 2, max(xi - 1, 0) : xi + 2, k % 3] = 1.0
    return imgs, kpts


def test_landmark_net_overfits(rng):
    import jax
    import jax.numpy as jnp
    import optax

    from morphablediffusion_tpu.eval import metrics as M
    from morphablediffusion_tpu.eval.keypoint_net import (
        LandmarkNet,
        keypoint_loss,
    )

    S = 64
    imgs, kpts = _synthetic_faces(rng, 4, S)
    net = LandmarkNet()
    params = net.init(jax.random.key(0), jnp.asarray(imgs[:1]))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(keypoint_loss)(
            params, net.apply, jnp.asarray(imgs), jnp.asarray(kpts)
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(150):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert final < first * 0.2, (first, final)

    coords, _ = net.apply(params, jnp.asarray(imgs))
    # the overfit net must re-identify its own training keypoints
    pck = M.pck(np.asarray(coords), kpts)
    assert pck > 0.5, pck


def test_keypoints_cli_native_roundtrip(tmp_path, rng):
    """train_keypoints -> eval_keypoints --backend native -> valid JSON."""
    from morphablediffusion_tpu.apps.eval_keypoints import main as kpts_main
    from morphablediffusion_tpu.apps.train_keypoints import main as train_main

    S = 64
    imgs, kpts = _synthetic_faces(rng, 2, S)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    labels = {}
    for i in range(2):
        name = f"view_{i:05d}"
        Image.fromarray((imgs[i] * 255).astype(np.uint8)).save(
            img_dir / f"{name}.png"
        )
        labels[name] = kpts[i].tolist()
    label_path = tmp_path / "labels.json"
    label_path.write_text(json.dumps(labels))

    weights = tmp_path / "net.msgpack"
    train_main([
        "--image_dir", str(img_dir), "--labels", str(label_path),
        "--out", str(weights), "--steps", "5", "--batch", "2",
        "--image_size", str(S),
    ])
    assert weights.is_file()

    # the --augment path loads RGBA and trains on composited RGB — run it
    # end-to-end too (it regressed twice: ndarray.ptp, 4ch init example)
    weights_dr = tmp_path / "net_dr.msgpack"
    train_main([
        "--image_dir", str(img_dir), "--labels", str(label_path),
        "--out", str(weights_dr), "--steps", "3", "--batch", "2",
        "--image_size", str(S), "--augment",
    ])
    assert weights_dr.is_file()

    out = tmp_path / "kpts.json"
    kpts_main([
        "--image_dir", str(img_dir), "--output", str(out),
        "--backend", "native", "--weights", str(weights),
        "--image_size", str(S),
    ])
    data = json.loads(out.read_text())
    assert sorted(data) == [f"view_{i:05d}" for i in range(2)]
    assert all(np.asarray(v).shape == (68, 2) for v in data.values())
    assert np.isfinite(np.asarray(list(data.values()))).all()


def test_augment_batch_transforms_labels_consistently(rng):
    """Domain randomization (train_keypoints --augment) must move the labels
    exactly with the image: a bright dot painted at each landmark position
    must be found at the TRANSFORMED label after augmentation."""
    from morphablediffusion_tpu.apps.train_keypoints import augment_batch

    from morphablediffusion_tpu.apps.train_keypoints import _random_background

    # every background class must at least evaluate (the gradient branch
    # regressed under NumPy 2.0's ndarray.ptp removal)
    r = np.random.default_rng(0)
    for _ in range(12):
        bg = _random_background(32, 32, r)
        assert bg.shape == (32, 32, 3) and np.isfinite(bg).all()

    H = W = 64
    n_trials = 6
    for t in range(n_trials):
        r = np.random.default_rng(100 + t)
        kpt = r.uniform(12, W - 12, size=(1, 1, 2)).astype(np.float32)
        rgba = np.zeros((1, H, W, 4), np.float32)
        rgba[..., 3] = 1.0  # opaque: background never shows
        x, y = int(round(kpt[0, 0, 0])), int(round(kpt[0, 0, 1]))
        rgba[0, y, x, :3] = 1.0  # single bright pixel at the landmark
        kpt[0, 0] = [x, y]
        aug_x, aug_y = augment_batch(rgba, kpt, r)
        # brightest output pixel ~ transformed label (bilinear resize +
        # optional blur smear within ~2 px)
        lum = aug_x[0].sum(-1)
        py, px = np.unravel_index(np.argmax(lum), lum.shape)
        assert abs(px - aug_y[0, 0, 0]) <= 2.5 and \
            abs(py - aug_y[0, 0, 1]) <= 2.5, (t, (px, py), aug_y[0, 0])
