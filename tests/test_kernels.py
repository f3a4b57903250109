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


def test_fused_groupnorm_silu_matches_reference():
    from tpu_diffusion.kernels.groupnorm import (fused_groupnorm_silu,
                                                 reference_groupnorm_silu)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 32), jnp.float32)
    gamma = jax.random.normal(jax.random.PRNGKey(1), (32,)) * 0.1 + 1.0
    beta = jax.random.normal(jax.random.PRNGKey(2), (32,)) * 0.1
    for act in ("silu", "none"):
        got = fused_groupnorm_silu(x, gamma, beta, num_groups=8, act=act)
        want = reference_groupnorm_silu(x, gamma, beta, num_groups=8,
                                        act=act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_fused_groupnorm_film_matches_reference():
    from tpu_diffusion.kernels.groupnorm import (fused_groupnorm_silu,
                                                 reference_groupnorm_silu)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 32), jnp.float32)
    gamma = jnp.ones((32,))
    beta = jnp.zeros((32,))
    scale = jax.random.normal(jax.random.PRNGKey(4), (2, 32)) * 0.2
    shift = jax.random.normal(jax.random.PRNGKey(5), (2, 32)) * 0.2
    got = fused_groupnorm_silu(x, gamma, beta, scale, shift, num_groups=4)
    want = reference_groupnorm_silu(x, gamma, beta, scale, shift,
                                    num_groups=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_unet_fused_norm_matches_xla(monkeypatch):
    """The whole UNet agrees between norm_impl settings (params re-mapped:
    the fused module holds scale/bias one level shallower)."""
    monkeypatch.setenv("TPU_DIFFUSION_FORCE_FUSED", "1")
    from tpu_diffusion.models.unet import UNetModel
    kwargs = dict(in_channels=1, model_channels=8, out_channels=1,
                  num_res_blocks=1, channel_mult=(1, 2),
                  attention_resolutions=(2,), num_heads=2,
                  use_scale_shift_norm=True, dtype=jnp.float32)
    m_x = UNetModel(norm_impl="xla", **kwargs)
    m_f = UNetModel(norm_impl="fused", **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1))
    t = jnp.array([0.1, 0.7])
    p_x = m_x.init(jax.random.PRNGKey(0), x, t)
    p_f = m_f.init(jax.random.PRNGKey(0), x, t)
    # same number of params, same shapes (order-matched leaves)
    lx = jax.tree.leaves(p_x)
    lf = jax.tree.leaves(p_f)
    assert [l.shape for l in lx] == [l.shape for l in lf]
    p_f = jax.tree.unflatten(jax.tree.structure(p_f), lx)
    np.testing.assert_allclose(
        np.asarray(m_x.apply(p_x, x, t)),
        np.asarray(m_f.apply(p_f, x, t)), atol=1e-4, rtol=1e-4)


def test_ring_attention_matches_dense():
    """Token-axis-sharded ring attention (SURVEY §5.7) is exact vs the
    dense softmax reference on the 8-device CPU mesh."""
    from tpu_diffusion.kernels.attention import reference_attention
    from tpu_diffusion.parallel.mesh import make_mesh
    from tpu_diffusion.parallel.sp import sequence_parallel_attention
    mesh = make_mesh(data=2, model=4)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (2, 4, 64, 16), jnp.float32)
               for kk in ks)
    want = reference_attention(q, k, v)
    got = jax.jit(lambda a, b, c: sequence_parallel_attention(
        a, b, c, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_attention_rejects_indivisible():
    from tpu_diffusion.parallel.mesh import make_mesh
    from tpu_diffusion.parallel.sp import (maybe_sequence_parallel,
                                           sequence_parallel_attention)
    import pytest
    mesh = make_mesh(data=2, model=4)
    q = jnp.zeros((1, 2, 30, 8))
    with pytest.raises(ValueError):
        sequence_parallel_attention(q, q, q, mesh)
    assert maybe_sequence_parallel(q, q, q, mesh) is None
    assert maybe_sequence_parallel(q, q, q, None) is None


def test_unet_with_ring_attention_matches_xla():
    """Whole UNet with sp_mesh set agrees with the single-device path."""
    from tpu_diffusion.models.unet import UNetModel
    from tpu_diffusion.parallel.mesh import make_mesh
    mesh = make_mesh(data=2, model=4)
    kwargs = dict(in_channels=1, model_channels=8, out_channels=1,
                  num_res_blocks=1, channel_mult=(1, 2),
                  attention_resolutions=(2,), num_heads=2,
                  dtype=jnp.float32)
    m_ref = UNetModel(**kwargs)
    m_sp = UNetModel(sp_mesh=mesh, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1))
    t = jnp.array([0.1, 0.7])
    p = m_ref.init(jax.random.PRNGKey(0), x, t)
    np.testing.assert_allclose(
        np.asarray(m_ref.apply(p, x, t)),
        np.asarray(m_sp.apply(p, x, t)), atol=1e-5, rtol=1e-5)


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
