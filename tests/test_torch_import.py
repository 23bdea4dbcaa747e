"""Round-trip test for reference ``.pth`` checkpoint migration: build the
torch rendition, save its state_dict, import into JAX, assert identical
logits — the full migration path a reference user would follow."""

import jax.numpy as jnp
import numpy as np
import torch

from adversarial_learning_on_pointclouds_tpu.models import (
    apply_classifier, apply_discriminator, apply_segmenter,
)
from adversarial_learning_on_pointclouds_tpu.utils import torch_import
from tests import torch_ref

B, N = 2, 64


def _pts():
    rng = np.random.default_rng(0)
    return rng.standard_normal((B, N, 3)).astype(np.float32)


def test_classifier_pth_roundtrip(tmp_path):
    m = torch_ref.PointNetClsTorch(40, feature_transform=True).eval()
    path = tmp_path / "cls.pth"
    torch.save(m.state_dict(), path)
    sd = torch_import.load_pth(str(path))
    params, state = torch_import.classifier_from_state_dict(sd)
    x = _pts()
    logp, _, _, _ = apply_classifier(params, state, jnp.asarray(x),
                                     train=False)
    with torch.no_grad():
        ref, _, _ = m(torch.from_numpy(x).transpose(2, 1))
    np.testing.assert_allclose(np.asarray(logp), ref.numpy(), atol=1e-5)


def test_segmenter_pth_roundtrip(tmp_path):
    m = torch_ref.PointNetDenseClsTorch(50, feature_transform=False).eval()
    path = tmp_path / "seg.pth"
    torch.save(m.state_dict(), path)
    params, state = torch_import.segmenter_from_state_dict(
        torch_import.load_pth(str(path)))
    x = _pts()
    logp, _, _, _ = apply_segmenter(params, state, jnp.asarray(x),
                                    train=False)
    with torch.no_grad():
        ref, _, _ = m(torch.from_numpy(x).transpose(2, 1))
    np.testing.assert_allclose(np.asarray(logp), ref.numpy(), atol=1e-5)


def test_discriminator_pth_roundtrip(tmp_path):
    m = torch_ref.FCDiscriminatorTorch(50).eval()
    path = tmp_path / "d.pth"
    torch.save(m.state_dict(), path)
    params = torch_import.discriminator_from_state_dict(
        torch_import.load_pth(str(path)))
    rng = np.random.default_rng(1)
    probs = rng.dirichlet(np.ones(50), size=(B, N)).astype(np.float32)
    out = apply_discriminator(params, jnp.asarray(probs))
    with torch.no_grad():
        ref = m(torch.from_numpy(probs).transpose(2, 1))
    np.testing.assert_allclose(np.asarray(out)[..., 0],
                               ref.numpy()[:, 0, :], atol=1e-5)
