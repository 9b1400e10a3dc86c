"""Golden parity: IRSE50 Re-ID descriptor vs the reference torch Backbone.

Runs the ACTUAL reference IR-SE50 code (ldm/thirdp/psp/model_irse.py
Backbone(112, 50, 'ir_se') — the architecture `model_ir_se50.pth` weights
target), exports its randomly-initialized state_dict, imports it through
`import_irse_state_dict`, and asserts the descriptors match.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_backbone():
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ldm.thirdp.psp.model_irse import Backbone

    torch.manual_seed(11)
    net = Backbone(input_size=112, num_layers=50, mode="ir_se",
                   drop_ratio=0.6).eval()
    # non-trivial BN running stats (fresh ones are identity-ish)
    with torch.no_grad():
        for mod in net.modules():
            if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
    return net


def test_irse50_golden_vs_reference(ref_backbone, rng):
    import jax
    import jax.numpy as jnp

    from morphablediffusion_tpu.eval.irse import IRSE50, import_irse_state_dict

    x = rng.normal(size=(2, 112, 112, 3)).astype(np.float32) * 0.5

    with torch.no_grad():
        want = ref_backbone(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        ).numpy()

    net = IRSE50()
    like = net.init(jax.random.key(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in ref_backbone.state_dict().items()}
    params, report = import_irse_state_dict(sd, like)
    assert not report["unmatched_model_paths"], (
        report["unmatched_model_paths"][:8]
    )
    assert not report["unused_torch_keys"], report["unused_torch_keys"][:8]

    got = np.asarray(net.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # descriptors are l2-normalized
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_face_descriptor_distances(ref_backbone, rng):
    """Euclidean distances between descriptors of identical images are 0;
    the front end (crop + resize) is deterministic."""
    import jax

    from morphablediffusion_tpu.eval.irse import (
        IRSE50,
        face_descriptors,
        import_irse_state_dict,
    )
    import jax.numpy as jnp

    imgs = rng.uniform(0, 1, (2, 256, 256, 3)).astype(np.float32)
    net = IRSE50()
    like = net.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))
    sd = {k: v.numpy() for k, v in ref_backbone.state_dict().items()}
    params, _ = import_irse_state_dict(sd, like)

    d1 = face_descriptors(imgs, params)
    d2 = face_descriptors(imgs, params)
    assert d1.shape == (2, 512)
    np.testing.assert_allclose(d1, d2)
    assert np.linalg.norm(d1[0] - d1[1]) > 1e-3  # distinct images differ
