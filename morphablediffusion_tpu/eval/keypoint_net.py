"""Native 68-landmark detector — the in-repo keypoint backend for PCK.

The reference's keypoint stage shells out to mmdet (YOLOX face detector) +
mmpose (HRNetV2 top-down) CUDA model zoos (eval/predict_keypoints.py). The
framework-native equivalent is this compact heatmap network: a strided conv
encoder with residual blocks and a transposed-conv head producing 68
heatmaps at 1/4 resolution, decoded with a differentiable soft-argmax. It is
trained from scratch on the user's own data with
`apps/train_keypoints.py` — labels come from existing kpts JSONs or from
68 mesh landmarks projected with the dataset's cameras — and then drives
`apps/eval_keypoints.py --backend native`, so the full PCK pipeline runs
with no external model zoo.

TPU notes: whole-image convs (MXU-friendly, channels-last, bf16-ready);
soft-argmax is a pair of tiny reductions XLA fuses into the head conv; a
training step is one jit graph.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ResBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=8)(x)
        h = nn.silu(h)
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride,) * 2)(h)
        h = nn.GroupNorm(num_groups=8)(h)
        h = nn.silu(h)
        h = nn.Conv(self.ch, (3, 3))(h)
        if x.shape[-1] != self.ch or self.stride != 1:
            x = nn.Conv(self.ch, (1, 1), strides=(self.stride,) * 2)(x)
        return x + h


class LandmarkNet(nn.Module):
    """(B, S, S, 3) in [0, 1] -> (B, 68, 2) pixel coords + (B, 68, h, w)
    heatmaps (h = S//4)."""

    num_keypoints: int = 68
    widths: Tuple[int, ...] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x):
        S = x.shape[1]
        h = nn.Conv(self.widths[0], (7, 7), strides=(2, 2))(x * 2.0 - 1.0)
        for w in self.widths[1:]:
            h = ResBlock(w, stride=2)(h)
            h = ResBlock(w)(h)
        # S/16 -> S/4 with two transposed convs
        h = nn.ConvTranspose(self.widths[2], (4, 4), strides=(2, 2))(h)
        h = nn.silu(nn.GroupNorm(num_groups=8)(h))
        h = nn.ConvTranspose(self.widths[1], (4, 4), strides=(2, 2))(h)
        h = nn.silu(nn.GroupNorm(num_groups=8)(h))
        maps = nn.Conv(self.num_keypoints, (1, 1))(h)  # (B, S/4, S/4, 68)
        maps = jnp.moveaxis(maps, -1, 1)  # (B, 68, h, w)
        coords = soft_argmax(maps) * (S / maps.shape[-1])
        return coords, maps


def soft_argmax(maps: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
    """(B, K, h, w) -> (B, K, 2) expected (x, y) in heatmap pixels."""
    B, K, h, w = maps.shape
    p = jax.nn.softmax(maps.reshape(B, K, h * w) / temperature, axis=-1)
    # expectations as matvecs over the flattened grid: mathematically the
    # same marginal sums, but avoids a two-axis reduce whose (B,68,h,w)
    # operand trips a TPU AOT layout bug (reduce dims={1,2} -> the compiler
    # asserts f32[32,68] vs f32[68,32]{1,0:T(8,128)})
    grid_x = jnp.tile(jnp.arange(w, dtype=p.dtype), h)
    grid_y = jnp.repeat(jnp.arange(h, dtype=p.dtype), w)
    x = p @ grid_x
    y = p @ grid_y
    return jnp.stack([x, y], axis=-1)


def keypoint_loss(params, apply_fn, images, kpts):
    """Soft-argmax L2 in image pixels, normalized by image size."""
    coords, _ = apply_fn(params, images)
    S = images.shape[1]
    return jnp.mean(jnp.sum(((coords - kpts) / S) ** 2, axis=-1))


# --------------------------------------------------------------------- #
# (de)serialization — msgpack via flax, no orbax dependency for a tiny net


def save_params(path: str, params: Any, num_keypoints: int = 68):
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(
            {"num_keypoints": num_keypoints, "params": params}
        ))


def load_params(path: str, image_size: int = 256):
    from flax import serialization

    net = LandmarkNet()
    like = jax.eval_shape(
        lambda: net.init(jax.random.key(0),
                         jnp.zeros((1, image_size, image_size, 3)))
    )
    like = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), like)
    with open(path, "rb") as f:
        state = serialization.from_bytes(
            {"num_keypoints": 68, "params": like}, f.read()
        )
    return net, state["params"]


def detect(net: LandmarkNet, params, images: np.ndarray,
           chunk: int = 8) -> np.ndarray:
    """(N, S, S, 3) [0,1] -> (N, 68, 2) pixel keypoints."""
    fn = jax.jit(lambda p, x: net.apply(p, x)[0])
    out = []
    for lo in range(0, len(images), chunk):
        x = jnp.asarray(images[lo : lo + chunk])
        out.append(np.asarray(fn(params, x)))
    return np.concatenate(out)
