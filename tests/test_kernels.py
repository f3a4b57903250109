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


@pytest.mark.slow
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


def test_unet_with_fused_attention_matches_xla():
    """attention_impl='pallas_fused' (raw-QKV kernel, zero transposes)
    agrees with the XLA einsum path on the whole UNet, and reports its
    engagement in the decision log."""
    from tpu_diffusion.models.unet import (UNetModel, attn_decisions,
                                           reset_attn_decisions)
    kwargs = dict(in_channels=1, model_channels=8, out_channels=1,
                  num_res_blocks=1, channel_mult=(1, 2),
                  attention_resolutions=(2,), num_heads=2,
                  dtype=jnp.float32)
    m_x = UNetModel(attention_impl="xla", **kwargs)
    m_f = UNetModel(attention_impl="pallas_fused", **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1))
    t = jnp.array([0.1, 0.7])
    params = m_x.init(jax.random.PRNGKey(0), x, t)
    reset_attn_decisions()
    got = m_f.apply(params, x, t)
    assert any(d["impl"] == "pallas_fused" for d in attn_decisions())
    np.testing.assert_allclose(
        np.asarray(m_x.apply(params, x, t)),
        np.asarray(got), atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Whole-ResBlock megakernel (kernels/resblock.py) + fused inference engine
# (models/unet_infer.py)
# ---------------------------------------------------------------------------


def _resblock_args(rng, B, H, W, Cin, Cout, scale_shift=True):
    mk = lambda *s: jnp.asarray(rng.normal(size=s, scale=0.08),
                                jnp.float32)
    ea = 1.0 + mk(B, Cout) if scale_shift else None
    return (mk(B, H, W, Cin), mk(Cin), mk(Cin), mk(3, 3, Cin, Cout),
            mk(Cout), mk(Cout), mk(Cout), ea, mk(B, Cout),
            mk(3, 3, Cout, Cout), mk(Cout),
            mk(Cin, Cout) if Cin != Cout else None,
            mk(Cout) if Cin != Cout else None)


@pytest.mark.parametrize("cin,cout,scale_shift", [
    (32, 32, True), (32, 64, True), (64, 32, False)])
def test_fused_resblock_matches_flax_math(cin, cout, scale_shift):
    """Kernel (interpret mode) == pure-jnp mirror == semantics of the flax
    ResBlock (the mirror itself is pinned against ResBlock in
    test_fused_resblock_matches_flax_module)."""
    from tpu_diffusion.kernels.resblock import (fused_resblock,
                                                resblock_reference)
    rng = np.random.default_rng(0)
    args = _resblock_args(rng, 4, 8, 8, cin, cout, scale_shift)
    want = resblock_reference(*args)
    got = fused_resblock(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_resblock_matches_flax_module():
    """The jnp mirror reproduces models.unet.ResBlock exactly (fp32)."""
    from tpu_diffusion.kernels.resblock import resblock_reference
    from tpu_diffusion.models.unet import ResBlock
    rng = np.random.default_rng(1)
    B, H, W, Cin, Cout = 3, 8, 8, 16, 32
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(B, 12)), jnp.float32)
    block = ResBlock(Cout, 0.0, True, dtype=jnp.float32,
                     norm_dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, emb)
    params = jax.tree.map(lambda a: jnp.asarray(
        rng.normal(size=a.shape, scale=0.05), a.dtype), params)
    want = block.apply(params, x, emb)
    p = params["params"]
    gn1 = p["GroupNorm32_0"]["GroupNorm_0"]
    gn2 = p["GroupNorm32_1"]["GroupNorm_0"]
    d = p["Dense_0"]
    emb_out = jnp.dot(jax.nn.silu(emb), d["kernel"]) + d["bias"]
    sc, sh = jnp.split(emb_out, 2, -1)
    got = resblock_reference(
        x, gn1["scale"], gn1["bias"], p["Conv_0"]["kernel"],
        p["Conv_0"]["bias"], gn2["scale"], gn2["bias"], 1.0 + sc, sh,
        p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
        p["Conv_2"]["kernel"][0, 0], p["Conv_2"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-5)


@pytest.mark.slow
def test_fused_unet_inference_matches_model_apply():
    """The param-tree inference engine == model.apply on the full UNet,
    including encode/decode cache modes (models/unet_infer.py)."""
    from tpu_diffusion.models.unet import create_model
    from tpu_diffusion.models.unet_infer import make_fused_apply
    rng = np.random.default_rng(2)
    model = create_model(image_size=16, num_channels=8, num_res_blocks=2,
                         in_channels=3, channel_mult=(1, 2), num_heads=2,
                         attention_resolutions="8", dropout=0.0,
                         use_scale_shift_norm=True, dtype=jnp.float32,
                         norm_dtype=jnp.float32, attention_impl="xla")
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(2,)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    params = jax.tree.map(lambda a: jnp.asarray(
        rng.normal(size=a.shape, scale=0.05), a.dtype), params)
    want = model.apply(params, x, t)
    fn = make_fused_apply(model, params, resblock="pallas", interpret=True)
    got = fn(x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    # encode/decode round trip equals the flax cache modes
    h, skips = fn(x, t, mode="encode")
    hw, skipsw = model.apply(params, x, t, mode="encode")
    np.testing.assert_allclose(np.asarray(h), np.asarray(hw), atol=2e-5,
                               rtol=1e-4)
    dec = fn(x, t, mode="decode", cache=(h, skips))
    decw = model.apply(params, x, t, mode="decode", cache=(hw, skipsw))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(decw),
                               atol=2e-5, rtol=1e-4)


def test_flash_attention_fused_matches_reference():
    """The fused-QKV kernel (raw [B,T,3C] projection in, merged [B,T,C]
    out, zero transposes) must match the einsum reference exactly up to
    fp32 softmax tolerance, for dividing and non-dividing block sizes."""
    from tpu_diffusion.kernels.attention import (_fused_ref,
                                                 flash_attention_fused)
    # (128,...,64) and (96,...,64) resolve to full-row blocks -> the
    # single-operand kernel (one DMA per program); (256,...,128) keeps
    # bq=128 < T -> the two-operand q-block/kv-row kernel
    for t, c, heads, bq in ((128, 64, 2, 64), (96, 48, 3, 64),
                            (256, 32, 2, 128)):
        qkv = jax.random.normal(jax.random.PRNGKey(3), (2, t, 3 * c),
                                jnp.float32)
        out = flash_attention_fused(qkv, heads, bq)
        want = _fused_ref(qkv, heads)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_flash_attention_fused_gradients_match():
    """custom-vjp backward (XLA reference recompute) == grad of the
    reference — the guidance samplers differentiate through attention."""
    from tpu_diffusion.kernels.attention import (_fused_ref,
                                                 flash_attention_fused)
    qkv = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 3 * 32),
                            jnp.float32)
    gf = jax.grad(lambda x: jnp.sum(flash_attention_fused(x, 2, 32) ** 2))(qkv)
    gr = jax.grad(lambda x: jnp.sum(_fused_ref(x, 2) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=1e-3, rtol=1e-3)
