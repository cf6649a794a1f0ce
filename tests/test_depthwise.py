"""Pallas depthwise conv: numerics + gradients vs lax oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2tpu.ops.depthwise_conv import _lax_depthwise, depthwise_conv2d, depthwise_conv2d_s1


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("c", [8, 130])  # within one lane tile / across tiles
def test_depthwise_forward_matches_lax(rng, k, c):
    x = jnp.asarray(rng.normal(size=(2, 12, 10, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, c)).astype(np.float32))
    ours = depthwise_conv2d_s1(x, w, True)
    ref = _lax_depthwise(x, w, 1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_depthwise_gradients_match_lax(rng):
    k, c = 3, 16
    x = jnp.asarray(rng.normal(size=(2, 8, 8, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, c)).astype(np.float32))

    def loss_ours(x, w):
        return (depthwise_conv2d_s1(x, w, True) ** 2).sum()

    def loss_ref(x, w):
        return (_lax_depthwise(x, w, 1) ** 2).sum()

    gx1, gw1 = jax.grad(loss_ours, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-4)


def test_depthwise_even_kernel_padding(rng):
    """k=2 exercises asymmetric SAME padding in forward (input grad path is
    only exact for odd kernels; EfficientNet uses 3 and 5 exclusively)."""
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 2, 4)).astype(np.float32))
    ours = depthwise_conv2d_s1(x, w, True)
    ref = _lax_depthwise(x, w, 1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_dispatch_stride2_uses_lax(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4)).astype(np.float32))
    out = depthwise_conv2d(x, w, stride=2)
    assert out.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_lax_depthwise(x, w, 2)), rtol=1e-5)


def test_mbconv_uses_compatible_param_layout():
    """DepthwiseConv param layout matches nn.Conv's grouped kernel."""
    from s2tpu.models.efficientnet_unet import EfficientNetUNet, EfficientNetUNetConfig

    cfg = EfficientNetUNetConfig(version="b0", in_channels=6, num_classes=2)
    model = EfficientNetUNet(cfg)
    x = jnp.zeros((1, 32, 32, 6))
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, train=False))()
    k = variables["params"]["encoder"]["block_0"]["depthwise_conv"]["kernel"]
    assert k.shape == (3, 3, 1, 32)  # (k, k, 1, C) — converter-compatible
