"""Checkpoint migration utilities (r2 ADVICE item 2): norm-impl path remap
and positional remap between differently-named trees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_diffusion.models.unet import ResBlock
from tpu_diffusion.train.checkpoint import remap_by_order, remap_norm_impl


def _resblock_params(norm_impl: str):
    rb = ResBlock(out_channels=8, use_scale_shift_norm=True,
                  norm_impl=norm_impl, dtype=jnp.float32)
    params = rb.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 8)),
                     jnp.zeros((2, 16)))
    return rb, params


def test_norm_impl_remap_roundtrip_and_apply():
    rb_xla, p_xla = _resblock_params("xla")
    rb_fused, p_fused = _resblock_params("fused")

    # xla-trained params -> fused tree structure
    migrated = remap_norm_impl(p_xla, to="fused")
    assert jax.tree_util.tree_structure(migrated) \
        == jax.tree_util.tree_structure(p_fused)
    # and back, losslessly
    back = remap_norm_impl(migrated, to="xla")
    assert jax.tree_util.tree_structure(back) \
        == jax.tree_util.tree_structure(p_xla)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(p_xla)):
        np.testing.assert_array_equal(a, b)

    # the migrated params produce the same outputs under the other impl
    # (off-TPU the fused module uses its XLA fallback — same math, both
    # impls pinned at eps=1e-5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    out_xla = rb_xla.apply(p_xla, x, emb)
    out_fused = rb_fused.apply(migrated, x, emb)
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_fused),
                               atol=1e-5)


def test_norm_impl_remap_full_unet():
    """The full UNet includes the explicitly-named head norm (`out_norm`)
    that auto-name prefix matching missed — migration must produce the
    exact destination tree structure and identical outputs."""
    from tpu_diffusion.models.unet import create_model

    def build(norm_impl):
        m = create_model(image_size=8, num_channels=8, num_res_blocks=1,
                         in_channels=1, out_channels=1,
                         attention_resolutions="4", num_heads=1,
                         channel_mult=(1, 2),
                         norm_impl=norm_impl, attention_impl="xla")
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)),
                   jnp.zeros((1,)))
        return m, p

    m_xla, p_xla = build("xla")
    m_fused, p_fused = build("fused")

    migrated = remap_norm_impl(p_xla, to="fused")
    assert jax.tree_util.tree_structure(migrated) \
        == jax.tree_util.tree_structure(p_fused)
    back = remap_norm_impl(migrated, to="xla")
    assert jax.tree_util.tree_structure(back) \
        == jax.tree_util.tree_structure(p_xla)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 1))
    t = jnp.array([0.3])
    np.testing.assert_allclose(np.asarray(m_xla.apply(p_xla, x, t)),
                               np.asarray(m_fused.apply(migrated, x, t)),
                               atol=1e-5)


def test_remap_by_order_same_shapes():
    p1 = {"params": {"Conv_0": {"kernel": np.ones((3, 3, 4, 8)),
                                "bias": np.zeros(8)},
                     "Dense_0": {"kernel": np.ones((8, 4)),
                                 "bias": np.zeros(4)}}}
    p2 = {"params": {"conv_in": {"kernel": np.full((3, 3, 4, 8), 2.0),
                                 "bias": np.full(8, 2.0)},
                     "time_dense": {"kernel": np.full((8, 4), 2.0),
                                    "bias": np.full(4, 2.0)}}}
    out = remap_by_order(p1, p2)
    assert jax.tree_util.tree_structure(out) \
        == jax.tree_util.tree_structure(p1)
    for leaf in jax.tree.leaves(out):
        assert (np.asarray(leaf) == 2.0).all()


def test_remap_by_order_rejects_mismatch():
    p1 = {"a": np.zeros((2, 3))}
    with pytest.raises(ValueError):
        remap_by_order(p1, {"z": np.zeros((3, 2))})
    with pytest.raises(ValueError):
        remap_by_order(p1, {"x": np.zeros((2, 3)), "y": np.zeros(1)})
