"""Golden tests for the support codecs against reference formulas.

Reference semantics: models.py:645-689.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from muzero_general_tpu.ops import support


def test_contract_expand_roundtrip():
    x = jnp.array([-300.0, -5.5, -1.0, -0.3, 0.0, 0.3, 1.0, 5.5, 300.0])
    np.testing.assert_allclose(
        support.expand_scale(support.contract_scale(x)), x, rtol=1e-4, atol=1e-4
    )


def test_scalar_to_support_twohot():
    # h(0) = 0 → all mass on the center bin.
    out = support.scalar_to_support(jnp.array([0.0]), 10)
    assert out.shape == (1, 21)
    np.testing.assert_allclose(np.asarray(out[0, 10]), 1.0, atol=1e-6)
    assert np.asarray(jnp.sum(out)) == pytest.approx(1.0, abs=1e-6)


def test_scalar_to_support_splits_mass():
    # Pick x with h(x) = 2.5 exactly between bins 12 and 13 (support 10).
    h_target = 2.5
    x = support.expand_scale(jnp.array([h_target]))
    out = np.asarray(support.scalar_to_support(x, 10))[0]
    assert out[12] == pytest.approx(0.5, abs=1e-4)
    assert out[13] == pytest.approx(0.5, abs=1e-4)
    assert out.sum() == pytest.approx(1.0, abs=1e-5)


def test_scalar_to_support_clamps_extremes():
    out = np.asarray(support.scalar_to_support(jnp.array([1e9, -1e9]), 10))
    # Top of support: all mass in last / first bin, none dropped to bin 0.
    assert out[0, 20] == pytest.approx(1.0, abs=1e-5)
    assert out[1, 0] == pytest.approx(1.0, abs=1e-5)


def test_codec_roundtrip_through_logits():
    """support_to_scalar(log(scalar_to_support(x))) ≈ x within the support."""
    x = jnp.array([-90.0, -7.3, -1.2, 0.0, 0.7, 3.14, 55.0])
    probs = support.scalar_to_support(x, 300)
    logits = jnp.log(probs + 1e-12)
    back = support.support_to_scalar(logits, 300)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-2, atol=1e-2)


def test_support_to_scalar_uniform_is_zero():
    logits = jnp.zeros((3, 21))
    out = np.asarray(support.support_to_scalar(logits, 10))
    np.testing.assert_allclose(out, 0.0, atol=1e-4)


def test_matches_reference_torch_formula():
    """Direct numerical check against the torch implementation's math."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits_np = rng.normal(size=(4, 21)).astype(np.float32)

    # Reference support_to_scalar (models.py:645-666) re-run in torch.
    t = torch.tensor(logits_np)
    probs = torch.softmax(t, dim=1)
    sup = torch.arange(-10, 11).float().expand(probs.shape)
    xt = torch.sum(sup * probs, dim=1, keepdim=True)
    xt = torch.sign(xt) * (
        ((torch.sqrt(1 + 4 * 0.001 * (torch.abs(xt) + 1 + 0.001)) - 1) / (2 * 0.001))
        ** 2
        - 1
    )
    ours = np.asarray(support.support_to_scalar(jnp.array(logits_np), 10))
    np.testing.assert_allclose(ours, xt.numpy().squeeze(-1), rtol=1e-4, atol=1e-4)

    # Reference scalar_to_support (models.py:669-689) re-run in torch.
    x_np = rng.normal(size=(2, 5)).astype(np.float32) * 20
    xt = torch.tensor(x_np)
    xt = torch.sign(xt) * (torch.sqrt(torch.abs(xt) + 1) - 1) + 0.001 * xt
    xt = torch.clamp(xt, -10, 10)
    floor = xt.floor()
    prob = xt - floor
    ref = torch.zeros(2, 5, 21)
    ref.scatter_(2, (floor + 10).long().unsqueeze(-1), (1 - prob).unsqueeze(-1))
    indexes = floor + 10 + 1
    prob = prob.masked_fill_(20 < indexes, 0.0)
    indexes = indexes.masked_fill_(20 < indexes, 0.0)
    ref.scatter_(2, indexes.long().unsqueeze(-1), prob.unsqueeze(-1))
    ours = np.asarray(support.scalar_to_support(jnp.array(x_np), 10))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)
