"""IR-SE50 (ArcFace) face descriptor — the Re-ID backend.

The reference's Re-ID metric runs dlib's face_recognition_model_v1 and
counts generated views whose descriptor distance to the ground-truth view is
< 0.6 (eval/eval_2d_facescape.py:97-108). dlib is a C++ binary dep; the
framework-native backend is the IR-SE50 ArcFace backbone — the same
architecture the reference vendors at ldm/thirdp/psp/{model_irse,helpers}.py
(input conv/BN/PReLU, 4 stages of [3,4,14,3] squeeze-excite IR bottlenecks,
BN/flatten/linear/BN head, l2-normalized 512-d output) — so the widely
published `model_ir_se50.pth` weights import directly.

Inference-only: every BatchNorm is its frozen (running-stats) affine form and
dropout is identity, matching `Backbone.eval()` in the reference's IDFeatures
wrapper (ldm/thirdp/psp/id_loss.py:11-14).

Distances are Euclidean between l2-normalized descriptors, like dlib's; the
0.6 threshold was calibrated for dlib's ResNet and does NOT transfer to
IR-SE50's distance scale, so eval_2d REQUIRES an explicit --reid_threshold
when this backend is used — calibrate one with apps/calibrate_reid.py
(EER-threshold protocol; --pairing same_view matches the deployed metric's
geometry).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from morphablediffusion_tpu.utils.torch_import import (
    CONV2,
    DIRECT,
    LINEAR,
    NORM,
    _convert,
)

# stage plan: (in_channel, depth, num_units); first unit of each stage
# strides 2 (helpers.get_blocks(50))
STAGES: Tuple[Tuple[int, int, int], ...] = (
    (64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3),
)


class FrozenBN(nn.Module):
    """BatchNorm in inference form: affine from imported running stats."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (C,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (C,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * (scale * inv) + bias


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(C))."""

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "weight", nn.initializers.constant(0.25), (x.shape[-1],),
            jnp.float32,
        )
        return jnp.where(x >= 0, x, a * x)


def _conv(ch, kernel, stride, name):
    return nn.Conv(
        ch, (kernel, kernel), strides=(stride, stride),
        padding=((kernel // 2,) * 2,) * 2, use_bias=False, name=name,
    )


class SEModule(nn.Module):
    """Squeeze-excite: global pool -> 1x1 C/16 -> ReLU -> 1x1 C -> sigmoid."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = _conv(C // self.reduction, 1, 1, "fc1")(s)
        s = nn.relu(s)
        s = _conv(C, 1, 1, "fc2")(s)
        return x * jax.nn.sigmoid(s)


class BottleneckIRSE(nn.Module):
    """bottleneck_IR_SE: BN -> 3x3 -> PReLU -> 3x3(stride) -> BN -> SE, plus
    a shortcut (1-kernel maxpool subsample when in==depth, else 1x1+BN)."""

    depth: int
    stride: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if in_ch == self.depth:
            shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = _conv(self.depth, 1, self.stride, "shortcut_conv")(x)
            shortcut = FrozenBN(name="shortcut_bn")(shortcut)
        h = FrozenBN(name="res_bn1")(x)
        h = _conv(self.depth, 3, 1, "res_conv1")(h)
        h = PReLU(name="res_prelu")(h)
        h = _conv(self.depth, 3, self.stride, "res_conv2")(h)
        h = FrozenBN(name="res_bn2")(h)
        h = SEModule(name="se")(h)
        return h + shortcut


class IRSE50(nn.Module):
    """112x112x3 input in [-1, 1] -> l2-normalized (B, 512) descriptor."""

    @nn.compact
    def __call__(self, x):
        h = _conv(64, 3, 1, "input_conv")(x)
        h = FrozenBN(name="input_bn")(h)
        h = PReLU(name="input_prelu")(h)
        i = 0
        for in_ch, depth, units in STAGES:
            for u in range(units):
                h = BottleneckIRSE(
                    depth, 2 if u == 0 else 1, name=f"body_{i}"
                )(h)
                i += 1
        h = FrozenBN(name="out_bn2d")(h)
        # dropout: identity (eval mode)
        # torch flattens channels-first (C*H*W); keep our flatten
        # channels-last and permute the imported linear weight instead
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(512, name="out_linear")(h)
        h = FrozenBN(name="out_bn1d")(h)
        return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


# --------------------------------------------------------------------- #
# torch import

LINEAR_CF = "linear_cf"  # torch Linear over a channels-first flatten


def _convert_irse(kind: str, name: str, w: np.ndarray) -> np.ndarray:
    if kind == LINEAR_CF and name != "bias":
        # (512, C*H*W) with torch index c*H*W + h*W + w -> our flatten is
        # (h*W + w)*C + c
        O = w.shape[0]
        w = w.reshape(O, 512, 7, 7).transpose(2, 3, 1, 0)  # (H, W, C, O)
        return np.ascontiguousarray(w.reshape(-1, O))
    return _convert(kind, name, w)


def _bn(tprefix: str, opath: str) -> List[Tuple[str, str, str]]:
    return [
        (f"{tprefix}.weight", f"{opath}/scale", NORM),
        (f"{tprefix}.bias", f"{opath}/bias", NORM),
        (f"{tprefix}.running_mean", f"{opath}/mean", DIRECT),
        (f"{tprefix}.running_var", f"{opath}/var", DIRECT),
    ]


def irse_mapping() -> List[Tuple[str, str, str]]:
    """torch Backbone(112, 50, 'ir_se') state_dict -> IRSE50 param paths."""
    m: List[Tuple[str, str, str]] = [
        ("input_layer.0.weight", "input_conv/kernel", CONV2),
        ("input_layer.2.weight", "input_prelu/weight", DIRECT),
    ]
    m += _bn("input_layer.1", "input_bn")
    i = 0
    for in_ch, depth, units in STAGES:
        for u in range(units):
            t = f"body.{i}"
            o = f"body_{i}"
            if u == 0 and in_ch != depth:  # else: maxpool, no params
                m.append((f"{t}.shortcut_layer.0.weight",
                          f"{o}/shortcut_conv/kernel", CONV2))
                m += _bn(f"{t}.shortcut_layer.1", f"{o}/shortcut_bn")
            m += _bn(f"{t}.res_layer.0", f"{o}/res_bn1")
            m.append((f"{t}.res_layer.1.weight", f"{o}/res_conv1/kernel",
                      CONV2))
            m.append((f"{t}.res_layer.2.weight", f"{o}/res_prelu/weight",
                      DIRECT))
            m.append((f"{t}.res_layer.3.weight", f"{o}/res_conv2/kernel",
                      CONV2))
            m += _bn(f"{t}.res_layer.4", f"{o}/res_bn2")
            m.append((f"{t}.res_layer.5.fc1.weight", f"{o}/se/fc1/kernel",
                      CONV2))
            m.append((f"{t}.res_layer.5.fc2.weight", f"{o}/se/fc2/kernel",
                      CONV2))
            i += 1
    m += _bn("output_layer.0", "out_bn2d")
    m += [
        ("output_layer.3.weight", "out_linear/kernel", LINEAR_CF),
        ("output_layer.3.bias", "out_linear/bias", LINEAR),
    ]
    m += _bn("output_layer.4", "out_bn1d")
    return m


def import_irse_state_dict(state_dict: Dict[str, np.ndarray],
                           like: Dict[str, Any]):
    """Fill an IRSE50 init tree from a torch Backbone state_dict.

    Accepts both the bare backbone naming and the IDFeatures wrapper's
    `facenet.` prefix. Returns (params, report).
    """
    if any(k.startswith("facenet.") for k in state_dict):
        state_dict = {
            k[len("facenet."):]: v for k, v in state_dict.items()
            if k.startswith("facenet.")
        }
    flat: Dict[str, np.ndarray] = {}
    used = set()
    for tkey, opath, kind in irse_mapping():
        if tkey not in state_dict:
            continue
        flat[opath] = _convert_irse(
            kind, opath.rsplit("/", 1)[-1], np.asarray(state_dict[tkey])
        )
        used.add(tkey)

    import flax.traverse_util as tu

    inner = dict(tu.flatten_dict(like["params"], sep="/"))
    missing = [p for p in flat if p not in inner]
    for p, v in flat.items():
        if p in inner:
            assert inner[p].shape == v.shape, (p, inner[p].shape, v.shape)
            inner[p] = jnp.asarray(v)
    unfilled = [p for p in inner if p not in flat]
    report = {
        "filled": len(flat) - len(missing),
        "unused_torch_keys": [
            k for k in state_dict
            if k not in used and "num_batches_tracked" not in k
        ],
        "unmatched_model_paths": missing + unfilled,
    }
    return {"params": tu.unflatten_dict(inner, sep="/")}, report


# --------------------------------------------------------------------- #
# descriptor front end


def face_descriptors(images: np.ndarray, params) -> np.ndarray:
    """(B, H, W, 3) float [0, 1] images -> (B, 512) descriptors.

    Reference IDFeatures front end (id_loss.py:16-23): resize to 256, crop
    rows 35:223 / cols 32:220 (the face box), pool to 112. The pool is
    emulated with a bilinear resize of the 188x188 crop.
    """
    from PIL import Image

    crops = []
    for img in images:
        im = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        if im.size != (256, 256):
            im = im.resize((256, 256), Image.BILINEAR)
        im = im.crop((32, 35, 220, 223)).resize((112, 112), Image.BILINEAR)
        crops.append(np.asarray(im, np.float32) / 255.0)
    x = jnp.asarray(np.stack(crops)) * 2.0 - 1.0
    feats = jax.jit(IRSE50().apply)(params, x)
    return np.asarray(feats)
