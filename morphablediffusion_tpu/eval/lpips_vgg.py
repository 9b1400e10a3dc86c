"""LPIPS (VGG variant) — the learned perceptual metric, natively in JAX.

The reference computes LPIPS with the external `lpips` torch package
(eval/eval_2d_facescape.py:117 `lpips.LPIPS(net='vgg')`). This is the
framework-native equivalent: a flax VGG16 feature trunk importing the
published torchvision weights (`vgg16-397923af.pth`, keys `features.N.*`)
plus the LPIPS linear calibration importing the published
`lpips/weights/v0.1/vgg.pth` (keys `linN.model.1.weight`), evaluating the
exact published formula:

  scale inputs by the LPIPS ScalingLayer, run VGG16, take the five relu
  stages (relu1_2/2_2/3_3/4_3/5_3), unit-normalize each channel vector,
  square the difference, apply the non-negative 1x1 linear per stage,
  average spatially and sum over stages.

Wire into eval_2d with --lpips_vgg/--lpips_lin; values match the lpips
package to float tolerance (torch-oracle tested)."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 "features" conv indices and widths; the five LPIPS
# stages end after the relu at each closing index
VGG_CONVS: Tuple[Tuple[int, int], ...] = (
    (0, 64), (2, 64), (5, 128), (7, 128), (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512), (24, 512), (26, 512), (28, 512),
)
STAGE_ENDS = (2, 7, 14, 21, 28)  # conv index whose relu closes each stage
SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def _vgg_stages(params: Dict[str, Any], x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (B, H, W, 3) LPIPS-scaled. Returns the five relu feature maps."""
    stages = []
    h = x
    for idx, _ in VGG_CONVS:
        w = params[f"features_{idx}"]["kernel"]
        b = params[f"features_{idx}"]["bias"]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        h = jax.nn.relu(h)
        if idx in STAGE_ENDS:
            stages.append(h)
            if idx == STAGE_ENDS[-1]:
                break
            # torchvision pools sit between the stages (indices 4/9/16/23)
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
    return stages


def lpips_distance(a: np.ndarray, b: np.ndarray, params) -> np.ndarray:
    """a, b: (B, H, W, 3) in [0, 1] -> (B,) LPIPS distances."""

    def fn(pa, xa, xb):
        xa = (xa * 2.0 - 1.0 - SHIFT) / SCALE
        xb = (xb * 2.0 - 1.0 - SHIFT) / SCALE
        fa = _vgg_stages(pa["vgg"], xa)
        fb = _vgg_stages(pa["vgg"], xb)
        total = 0.0
        for s, (ya, yb) in enumerate(zip(fa, fb)):
            na = ya * jax.lax.rsqrt(jnp.sum(ya * ya, -1, keepdims=True) + 1e-10)
            nb = yb * jax.lax.rsqrt(jnp.sum(yb * yb, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            lin = pa["lins"][f"lin{s}"]  # (C,) non-negative weights
            total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
        return total

    return np.asarray(jax.jit(fn)(params, jnp.asarray(np.stack(a)),
                                  jnp.asarray(np.stack(b))))


def import_lpips_weights(vgg_sd: Dict[str, np.ndarray],
                         lin_sd: Dict[str, np.ndarray]):
    """(torchvision vgg16 state_dict, lpips vgg.pth state_dict) -> params.

    Returns (params, report). Accepts `linN.model.1.weight` and
    `lins.N.model.1.weight` namings for the calibration file."""
    vgg: Dict[str, Dict[str, jnp.ndarray]] = {}
    filled = 0
    for idx, width in VGG_CONVS:
        w = np.asarray(vgg_sd[f"features.{idx}.weight"], np.float32)
        b = np.asarray(vgg_sd[f"features.{idx}.bias"], np.float32)
        assert w.shape[0] == width, (idx, w.shape)
        vgg[f"features_{idx}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
        filled += 2
    lins: Dict[str, jnp.ndarray] = {}
    for s in range(5):
        for key in (f"lin{s}.model.1.weight", f"lins.{s}.model.1.weight"):
            if key in lin_sd:
                w = np.asarray(lin_sd[key], np.float32)  # (1, C, 1, 1)
                lins[f"lin{s}"] = jnp.asarray(w.reshape(-1))
                filled += 1
                break
        else:
            raise KeyError(f"lpips lin{s} weights not found")
    report = {"filled": filled}
    return {"vgg": vgg, "lins": lins}, report


def load_lpips(vgg_path: str, lin_path: str):
    """Load both weight files -> (distance_fn(images_a, images_b) -> (B,))."""
    import torch

    vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=False)
    vgg_sd = vgg_sd.get("state_dict", vgg_sd)
    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=False)
    lin_sd = lin_sd.get("state_dict", lin_sd)
    params, report = import_lpips_weights(
        {k: np.asarray(v) for k, v in vgg_sd.items()},
        {k: np.asarray(v) for k, v in lin_sd.items()},
    )
    print(f"lpips: {report['filled']} tensors imported")
    return lambda a, b: lpips_distance(a, b, params)
