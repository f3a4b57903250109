"""Pallas kernel correctness vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.kernels.attention import (flash_attention,
                                             reference_attention)


def _qkv(key, b=2, h=4, t=256, d=64, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    shape = (b, h, t, d)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Pallas TPU kernels run in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_flash_attention_matches_reference():
    q, k, v = _qkv(jax.random.PRNGKey(0), t=128, d=32)
    out = flash_attention(q, k, v, 64)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_uneven_block():
    # t=96 not divisible by 64 -> kernel must fall back to a smaller block
    q, k, v = _qkv(jax.random.PRNGKey(1), b=1, h=2, t=96, d=32)
    out = flash_attention(q, k, v, 64)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_gradients_match():
    q, k, v = _qkv(jax.random.PRNGKey(2), b=1, h=2, t=64, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_unet_with_pallas_attention_matches_xla():
    """The whole UNet agrees between attention_impl settings."""
    from tpu_diffusion.models.unet import UNetModel
    kwargs = dict(in_channels=1, model_channels=8, out_channels=1,
                  num_res_blocks=1, channel_mult=(1, 2),
                  attention_resolutions=(2,), num_heads=2,
                  dtype=jnp.float32)
    m_x = UNetModel(attention_impl="xla", **kwargs)
    m_p = UNetModel(attention_impl="pallas", **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1))
    t = jnp.array([0.1, 0.7])
    params = m_x.init(jax.random.PRNGKey(0), x, t)
    np.testing.assert_allclose(
        np.asarray(m_x.apply(params, x, t)),
        np.asarray(m_p.apply(params, x, t)), atol=1e-5, rtol=1e-4)
