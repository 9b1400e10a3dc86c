"""Native LPIPS(VGG) vs a plain-torch oracle of the published formula.

The oracle builds the torchvision VGG16 `features` trunk as an explicit
torch Sequential (same indices/widths), evaluates the exact lpips-package
computation (ScalingLayer -> five relu stages -> unit-normalize -> squared
diff -> non-negative 1x1 lins -> spatial mean -> sum), and our import path
consumes its state_dict under the published file namings."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from morphablediffusion_tpu.eval.lpips_vgg import (  # noqa: E402
    SCALE,
    SHIFT,
    VGG_CONVS,
    import_lpips_weights,
    lpips_distance,
)

STAGE_END_POS = (1, 3, 6, 9, 12)  # positions in VGG_CONVS closing a stage


def build_oracle(seed=0):
    g = torch.Generator().manual_seed(seed)
    convs = []
    in_ch = 3
    for _, width in VGG_CONVS:
        c = torch.nn.Conv2d(in_ch, width, 3, padding=1)
        with torch.no_grad():
            c.weight.normal_(0, 0.08, generator=g)
            c.bias.normal_(0, 0.02, generator=g)
        convs.append(c)
        in_ch = width
    lins = [torch.rand(width_of(s), generator=g) * 0.1
            for s in range(5)]
    return convs, lins


def width_of(stage):
    return VGG_CONVS[STAGE_END_POS[stage]][1]


def oracle_lpips(convs, lins, a, b):
    """a, b: (1, 3, H, W) in [0, 1]."""

    def stages(x):
        x = (x * 2 - 1 - torch.tensor(SHIFT).view(1, 3, 1, 1)) / torch.tensor(
            SCALE
        ).view(1, 3, 1, 1)
        out = []
        h = x
        for i, c in enumerate(convs):
            h = F.relu(c(h))
            if i in STAGE_END_POS:
                out.append(h)
                if i != STAGE_END_POS[-1]:
                    h = F.max_pool2d(h, 2, 2)
        return out

    total = 0.0
    with torch.no_grad():
        for s, (ya, yb) in enumerate(zip(stages(a), stages(b))):
            na = ya / torch.sqrt((ya * ya).sum(1, keepdim=True) + 1e-10)
            nb = yb / torch.sqrt((yb * yb).sum(1, keepdim=True) + 1e-10)
            d = (na - nb) ** 2
            w = lins[s].view(1, -1, 1, 1)
            total += float((d * w).sum(1).mean())
    return total


def test_lpips_matches_torch_oracle(rng):
    convs, lins = build_oracle()
    # published-file namings: torchvision features.N.*, lpips linN.model.1
    vgg_sd = {}
    for (idx, _), c in zip(VGG_CONVS, convs):
        vgg_sd[f"features.{idx}.weight"] = c.weight.detach().numpy()
        vgg_sd[f"features.{idx}.bias"] = c.bias.detach().numpy()
    lin_sd = {f"lin{s}.model.1.weight": lins[s].numpy().reshape(1, -1, 1, 1)
              for s in range(5)}
    params, report = import_lpips_weights(vgg_sd, lin_sd)
    assert report["filled"] == len(VGG_CONVS) * 2 + 5

    a = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    got = lpips_distance(a, b, params)
    want = [
        oracle_lpips(convs, lins,
                     torch.from_numpy(a[i].transpose(2, 0, 1))[None],
                     torch.from_numpy(b[i].transpose(2, 0, 1))[None])
        for i in range(2)
    ]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
    # identical inputs -> exactly zero distance
    z = lpips_distance(a, a, params)
    np.testing.assert_allclose(z, 0.0, atol=1e-7)
    # accepts the alternate lins naming
    lin_sd2 = {f"lins.{s}.model.1.weight": v.reshape(1, -1, 1, 1)
               for s, v in enumerate(l.numpy() for l in lins)}
    params2, _ = import_lpips_weights(vgg_sd, lin_sd2)
    np.testing.assert_allclose(lpips_distance(a, b, params2), got)
