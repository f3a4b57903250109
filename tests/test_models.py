"""Golden-shape and invariance tests for the UNet family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_diffusion.models.unet import (InPaintModelWrapper,
                                       SuperResModelWrapper, UNetModel,
                                       UNetModelWrapper, attention_ds,
                                       create_model)


@pytest.fixture(scope="module")
def small_model_and_params():
    model = create_model(image_size=28, num_channels=16, num_res_blocks=1,
                         in_channels=1, attention_resolutions="14",
                         use_scale_shift_norm=True, dtype=jnp.float32)
    x = jnp.zeros((2, 28, 28, 1))
    t = jnp.zeros((2,))
    params = model.init(jax.random.PRNGKey(0), x, t)
    return model, params


def test_unet_output_shape(small_model_and_params):
    model, params = small_model_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 1))
    out = model.apply(params, x, jnp.array([0.1, 0.9]))
    assert out.shape == (2, 28, 28, 1)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_zero_init_output_head(small_model_and_params):
    """The zero-initialized head makes the fresh model output exactly 0 —
    the reference's `zero_module` convention (unet.py:702-706)."""
    model, params = small_model_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 28, 28, 1))
    out = model.apply(params, x, jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_unet_jit_and_grad(small_model_and_params):
    model, params = small_model_and_params

    @jax.jit
    def loss(p, x, t):
        return jnp.mean(model.apply(p, x, t) ** 2)

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 28, 28, 1))
    g = jax.grad(loss)(params, x, jnp.array([0.3, 0.3]))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_attention_ds_parsing():
    assert attention_ds(32, "16,8") == (2, 4)
    assert attention_ds(64, "16") == (4,)
    assert attention_ds(28, "") == ()


def test_class_conditional_unet():
    model = create_model(image_size=28, num_channels=8, num_res_blocks=1,
                         in_channels=1, attention_resolutions="",
                         class_cond=True, num_classes=10, dtype=jnp.float32)
    x = jnp.zeros((2, 28, 28, 1))
    t = jnp.zeros((2,))
    y = jnp.array([3, 7])
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    out = model.apply(params, x, t, y)
    assert out.shape == (2, 28, 28, 1)


def test_cfm_wrapper_signatures():
    """UNetModelWrapper(t, x); InPaint(t, x, con); SuperRes(t, x, low_res)."""
    m = UNetModelWrapper(dim=(28, 28, 1), num_channels=8,
                         attention_resolutions="14", dtype=jnp.float32)
    x = jnp.zeros((2, 28, 28, 1))
    t = jnp.array([0.2, 0.8])
    p = m.init(jax.random.PRNGKey(0), t, x)
    assert m.apply(p, t, x).shape == x.shape

    ip = InPaintModelWrapper(dim=(28, 28, 1), num_channels=8,
                             attention_resolutions="14", dtype=jnp.float32)
    con = jnp.zeros_like(x)
    p = ip.init(jax.random.PRNGKey(0), t, x, con)
    assert ip.apply(p, t, x, con).shape == x.shape

    sr = SuperResModelWrapper(dim=(28, 28, 1), num_channels=8,
                              attention_resolutions="14", dtype=jnp.float32)
    low = jnp.zeros((2, 7, 7, 1))
    p = sr.init(jax.random.PRNGKey(0), t, x, low)
    assert sr.apply(p, t, x, low).shape == x.shape


def test_scalar_time_broadcasts():
    """torchdyn-style callers pass scalar t; must broadcast over batch."""
    m = UNetModelWrapper(dim=(28, 28, 1), num_channels=8,
                         attention_resolutions="", dtype=jnp.float32)
    x = jnp.zeros((3, 28, 28, 1))
    p = m.init(jax.random.PRNGKey(0), jnp.array(0.5), x)
    out = m.apply(p, jnp.array(0.5), x)
    assert out.shape == x.shape


def test_resblock_updown_variant():
    model = UNetModel(in_channels=3, model_channels=8, out_channels=3,
                      num_res_blocks=1, channel_mult=(1, 2),
                      attention_resolutions=(2,), resblock_updown=True,
                      num_heads=2, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,))
    params = model.init(jax.random.PRNGKey(0), x, t)
    assert model.apply(params, x, t).shape == (1, 16, 16, 3)


def test_attention_decision_log(small_model_and_params):
    """attn_decisions records each AttentionBlock impl resolution at trace
    time (the sp_decisions pattern) — harness code asserts flash engagement
    from this instead of trusting the 'auto' heuristic silently falling
    back (scripts/sr256_bench.py)."""
    from tpu_diffusion.models.unet import attn_decisions, reset_attn_decisions
    model, params = small_model_and_params
    reset_attn_decisions()
    x = jnp.zeros((2, 28, 28, 1))
    t = jnp.zeros((2,))
    # decisions are appended when __call__ executes (eagerly or at trace
    # time); jax.jit(model.apply) can HIT the jit cache from an earlier
    # test (bound methods compare equal) and skip tracing entirely, so
    # drive the module eagerly here
    model.apply(params, x, t)
    ds = attn_decisions()
    assert ds, "no attention decisions recorded"
    # attention_resolutions="14" on a 28px model -> T=196 grids, plus the
    # always-attending middle block at the 7x7 bottleneck (T=49)
    assert {d["tokens"] for d in ds} <= {196, 49}
    assert 196 in {d["tokens"] for d in ds}
    assert all(d["impl"] == "xla" for d in ds)  # CPU: auto resolves to xla
    reset_attn_decisions()
    assert attn_decisions() == []
