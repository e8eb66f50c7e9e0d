"""Hot-path op rewrites: decomposed dilated conv, flip-folded crop
resample.  Each must match its naive formulation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp2_tpu.augment.functional import CropParams, crop_resize_bilinear
from cp2_tpu.models.layers import ConvModule, DilatedConv3x3


def _lax_dilated_conv(x, kern, bias, d):
    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return ref if bias is None else ref + bias


@pytest.mark.parametrize("d,hw", [(18, 14), (12, 14), (6, 14), (14, 14)])
def test_decomposed_dilated_conv_matches_lax(d, hw):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, hw, hw, 8).astype(np.float32))
    m = DilatedConv3x3(12, d, use_bias=True)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    ref = _lax_dilated_conv(
        x, v["params"]["kernel"], v["params"]["bias"], d
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_convmodule_gate_and_param_tree():
    """ConvModule decomposes only when dilation covers the whole grid, and
    both paths expose the identical conv/kernel param tree."""
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 14, 14, 8).astype(np.float32))
    for d in (18, 12):
        m = ConvModule(12, 3, dilation=d, norm_cfg=None, act=None)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        assert set(v["params"]["conv"]) == {"kernel", "bias"}
        assert v["params"]["conv"]["kernel"].shape == (3, 3, 8, 12)
        out = m.apply(v, x, train=False)
        ref = _lax_dilated_conv(
            x, v["params"]["conv"]["kernel"], v["params"]["conv"]["bias"], d
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_decomposed_dilated_conv_gradients():
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(1, 14, 14, 4).astype(np.float32))
    m = DilatedConv3x3(6, 12, use_bias=False)
    v = m.init(jax.random.PRNGKey(0), x)
    kern = v["params"]["kernel"]

    def f_ours(kern, x):
        return jnp.sum(m.apply({"params": {"kernel": kern}}, x) ** 2)

    def f_ref(kern, x):
        return jnp.sum(_lax_dilated_conv(x, kern, None, 12) ** 2)

    g1 = jax.grad(f_ours, argnums=(0, 1))(kern, x)
    g2 = jax.grad(f_ref, argnums=(0, 1))(kern, x)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_space_to_depth_stem_conv_matches_dense():
    """The s2d stem rewrite must equal the plain 7x7/s2/p3 conv — values
    and both gradients — and keep the (7,7,Cin,Cout) param tree."""
    from flax import linen as nn
    from cp2_tpu.models.layers import SpaceToDepthConv

    r = np.random.RandomState(0)
    for h, w in [(16, 16), (32, 48)]:
        x = jnp.asarray(r.randn(2, h, w, 3).astype(np.float32))
        ref = nn.Conv(
            16, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False
        )
        vref = ref.init(jax.random.PRNGKey(0), x)
        kern = vref["params"]["kernel"]
        assert kern.shape == (7, 7, 3, 16)
        m = SpaceToDepthConv(16, use_bias=False)
        want = ref.apply(vref, x)
        got = m.apply({"params": {"kernel": kern}}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

        g1 = jax.grad(
            lambda k, xx: jnp.sum(ref.apply({"params": {"kernel": k}}, xx) ** 2),
            argnums=(0, 1),
        )(kern, x)
        g2 = jax.grad(
            lambda k, xx: jnp.sum(m.apply({"params": {"kernel": k}}, xx) ** 2),
            argnums=(0, 1),
        )(kern, x)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_convmodule_s2d_gate():
    """ConvModule routes the 7x7/s2 stem through the s2d path only for
    thin even-sized inputs; the param tree is unchanged either way."""
    r = np.random.RandomState(2)
    for h, w, cin, expect_s2d in [(16, 16, 3, True), (15, 16, 3, False), (16, 16, 8, False)]:
        x = jnp.asarray(r.randn(1, h, w, cin).astype(np.float32))
        m = ConvModule(16, 7, stride=2, padding=3, norm_cfg=None, act=None)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        assert v["params"]["conv"]["kernel"].shape == (7, 7, cin, 16)
        out = m.apply(v, x, train=False)
        import flax.linen as nn

        ref = nn.Conv(
            16, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=True
        )
        want = ref.apply({"params": v["params"]["conv"]}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)


def test_flip_folded_into_resample():
    img = jnp.asarray(np.random.RandomState(0).rand(20, 24, 3).astype(np.float32))
    kw = dict(y0=jnp.float32(2.3), x0=jnp.float32(1.7),
              h=jnp.float32(14.2), w=jnp.float32(17.5))
    out = crop_resize_bilinear(img, CropParams(flip=jnp.bool_(True), **kw), (8, 10))
    ref = crop_resize_bilinear(
        img, CropParams(flip=jnp.bool_(False), **kw), (8, 10)
    )[:, ::-1]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
