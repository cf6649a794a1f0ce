"""EfficientNet-UNet shape / scaling / semantics tests.

Everything runs under jit (one compile per fixture) — eager per-op dispatch
is ~30ms in this environment, so un-jitted init/apply of a 16-block model
takes minutes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2tpu.models.efficientnet_unet import (
    SCALING,
    EfficientNetEncoder,
    EfficientNetUNet,
    EfficientNetUNetConfig,
    build_block_specs,
    round_filters,
)

B0_CFG = EfficientNetUNetConfig(version="b0", in_channels=6, num_classes=4)
X = jnp.zeros((2, 64, 64, 6), jnp.float32)


@pytest.fixture(scope="module")
def unet_vars():
    model = EfficientNetUNet(B0_CFG)
    variables = jax.jit(lambda: model.init(jax.random.key(0), X, train=False))()
    return model, variables


def test_round_filters_goldens():
    # Divisor-8 rounding with the never-down->10% rule (reference parity).
    assert round_filters(32, 1.0) == 32
    assert round_filters(32, 1.1) == 32  # 35.2 rounds down to 32 (within the 10% rule)
    assert round_filters(1280, 1.1) == 1408  # b2 head
    assert round_filters(32, 1.6) == 48  # b5
    assert round_filters(1280, 1.6) == 2048  # b5 head
    assert round_filters(1280, 1.8) == 2304  # b6 head
    assert round_filters(16, 1.4) == 24  # b4 stage1
    assert round_filters(32, None) == 32


@pytest.mark.parametrize(
    "version,n_blocks,head",
    [("b0", 16, 1280), ("b1", 23, 1280), ("b5", 39, 2048), ("b7", 55, 2560)],
)
def test_block_scaling(version, n_blocks, head):
    w, d, _, _ = SCALING[version]
    specs = build_block_specs(w, d)
    assert len(specs) == n_blocks
    assert round_filters(1280, w) == head


def test_skip_filters_match_reference_tables():
    # The decoder concat widths implied by the encoder must reproduce the
    # reference's per-version magic `size` tables (efficientnet_unet.py:154-165):
    # size[j] = up_features[j] + skip_filters[j], size[4] = 32 + in_channels.
    expected = {
        "b0": [592, 296, 152, 80],
        "b1": [592, 296, 152, 80],
        "b2": [600, 304, 152, 80],
        "b3": [608, 304, 160, 88],
        "b4": [624, 312, 160, 88],
        "b5": [640, 320, 168, 88],
        "b6": [656, 328, 168, 96],
        "b7": [672, 336, 176, 96],
    }
    up = [512, 256, 128, 64]
    for version, sizes in expected.items():
        enc = EfficientNetEncoder(EfficientNetUNetConfig(version=version, in_channels=6, num_classes=4))
        got = [u + s for u, s in zip(up, enc.skip_filters)]
        assert got == sizes, f"{version}: {got} != {sizes}"


def test_unet_output_shape(unet_vars):
    model, variables = unet_vars
    y = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, X)
    assert y.shape == (2, 64, 64, 4)
    assert y.dtype == jnp.float32


def test_encoder_pyramid_shapes(unet_vars):
    model, variables = unet_vars
    enc = EfficientNetEncoder(B0_CFG)
    enc_vars = {k: v["encoder"] for k, v in variables.items()}
    head, feats = jax.jit(
        lambda v, x: enc.apply(v, x, train=False, method=enc.encode)
    )(enc_vars, X)
    assert head.shape == (2, 2, 2, 1280)  # 1/32 of 64
    assert [f.shape[1] for f in feats] == [2, 4, 8, 16, 32]  # deepest -> shallowest
    assert [f.shape[-1] for f in feats] == [1280, 80, 40, 24, 16]


def test_encoder_classification_head(unet_vars):
    model, variables = unet_vars
    enc = EfficientNetEncoder(B0_CFG)
    enc_vars = jax.jit(lambda: enc.init(jax.random.key(0), X[:1], train=False))()
    y = jax.jit(lambda v, x: enc.apply(v, x, train=False))(enc_vars, X[:1])
    assert y.shape == (1, 4)


def test_train_step_updates_batch_stats(unet_vars):
    model, variables = unet_vars
    x = jax.random.normal(jax.random.key(1), X.shape)

    @jax.jit
    def step(v, x):
        return model.apply(
            v, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)}
        )

    y, mutated = step(variables, x)
    assert y.shape == (2, 64, 64, 4)
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(leaves_before, leaves_after))


def test_class_prior_bias_init():
    # Bias init is checked without building the network (pure initializer).
    from s2tpu.models.efficientnet_unet import class_prior_bias_init

    dist = (0.0, 0.5, 0.3, 0.2)
    bias = class_prior_bias_init(dist)(jax.random.key(0), (4,))
    np.testing.assert_allclose(bias, np.log(np.asarray(dist) + 1e-6), rtol=1e-4)
    b2 = class_prior_bias_init((0.9, 0.1))(jax.random.key(0), (2,))
    np.testing.assert_allclose(b2, np.log((0.1 + 1e-6) / (0.9 + 1e-6)), rtol=1e-4)
    z = class_prior_bias_init(None)(jax.random.key(0), (4,), jnp.float32)
    np.testing.assert_array_equal(z, np.zeros(4))


def test_bf16_compute_dtype(unet_vars):
    _, variables = unet_vars
    model = EfficientNetUNet(B0_CFG, dtype=jnp.bfloat16)
    y = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, X.astype(jnp.bfloat16))
    # params stay f32, logits come out f32
    assert variables["params"]["encoder"]["stem_conv"]["kernel"].dtype == jnp.float32
    assert y.dtype == jnp.float32
    assert y.shape == (2, 64, 64, 4)


@pytest.mark.slow
def test_packed_input_stage_matches_dense():
    """Space-to-depth full-res stage == plain stage: same param/stats trees,
    same outputs (train + eval), same BN statistics."""
    import dataclasses

    import jax.tree_util as jtu

    from s2tpu.models.efficientnet_unet import EfficientNetUNet, EfficientNetUNetConfig

    cfg_p = EfficientNetUNetConfig(version="b0", in_channels=6, num_classes=4, packed_input_stage=True)
    cfg_d = dataclasses.replace(cfg_p, packed_input_stage=False)
    mp, md = EfficientNetUNet(cfg_p), EfficientNetUNet(cfg_d)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 6)).astype(np.float32))
    vp = jax.jit(lambda: mp.init(jax.random.key(0), jnp.zeros((1, 64, 64, 6)), train=False))()
    vd = jax.jit(lambda: md.init(jax.random.key(0), jnp.zeros((1, 64, 64, 6)), train=False))()
    pa, pb = jtu.tree_leaves_with_path(vp["params"]), jtu.tree_leaves_with_path(vd["params"])
    assert [jtu.keystr(k) for k, _ in pa] == [jtu.keystr(k) for k, _ in pb]
    for (k, a), (_, b) in zip(pa, pb):
        assert a.shape == b.shape, jtu.keystr(k)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=jtu.keystr(k))
    with jax.default_matmul_precision("highest"):
        yp = jax.jit(lambda v, x: mp.apply(v, x, train=False))(vp, x)
        yd = jax.jit(lambda v, x: md.apply(v, x, train=False))(vd, x)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), atol=2e-5)
        fp = jax.jit(lambda v, x, k: mp.apply(v, x, train=True, mutable=["batch_stats"], rngs={"dropout": k}))
        fd = jax.jit(lambda v, x, k: md.apply(v, x, train=True, mutable=["batch_stats"], rngs={"dropout": k}))
        yp2, mutp = fp(vp, x, jax.random.key(1))
        yd2, mutd = fd(vd, x, jax.random.key(1))
        np.testing.assert_allclose(np.asarray(yp2), np.asarray(yd2), atol=3e-4)
        sa = jtu.tree_leaves_with_path(mutp["batch_stats"])
        sb = jtu.tree_leaves_with_path(mutd["batch_stats"])
        assert [jtu.keystr(k) for k, _ in sa] == [jtu.keystr(k) for k, _ in sb]
        for (k, a), (_, b) in zip(sa, sb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, err_msg=jtu.keystr(k))


@pytest.mark.slow
@pytest.mark.parametrize("variant", [True, "dense"])
def test_packed_early_blocks_match_dense(variant):
    """c-major packed early blocks (flag-gated perf experiments — both the
    grouped-conv and the dense structural-zero depthwise expressions) must
    be numerically identical to the dense-layout path."""
    import dataclasses

    import jax.tree_util as jtu

    from s2tpu.models.efficientnet_unet import EfficientNetUNet, EfficientNetUNetConfig

    cfg_d = EfficientNetUNetConfig(version="b0", in_channels=6, num_classes=4, packed_early_blocks=False)
    cfg_p = dataclasses.replace(cfg_d, packed_early_blocks=variant)
    md, mp = EfficientNetUNet(cfg_d), EfficientNetUNet(cfg_p)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 6)).astype(np.float32))
    vd = jax.jit(lambda: md.init(jax.random.key(0), jnp.zeros((1, 64, 64, 6)), train=False))()
    vp = jax.jit(lambda: mp.init(jax.random.key(0), jnp.zeros((1, 64, 64, 6)), train=False))()
    pa = jtu.tree_leaves_with_path(vp["params"])
    pb = jtu.tree_leaves_with_path(vd["params"])
    assert [jtu.keystr(k) for k, _ in pa] == [jtu.keystr(k) for k, _ in pb]
    with jax.default_matmul_precision("highest"):
        yd = jax.jit(lambda v, x: md.apply(v, x, train=False))(vd, x)
        yp = jax.jit(lambda v, x: mp.apply(v, x, train=False))(vp, x)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), atol=2e-5)
        fd = jax.jit(lambda v, x, k: md.apply(v, x, train=True, mutable=["batch_stats"], rngs={"dropout": k}))
        fp = jax.jit(lambda v, x, k: mp.apply(v, x, train=True, mutable=["batch_stats"], rngs={"dropout": k}))
        yd2, mutd = fd(vd, x, jax.random.key(1))
        yp2, mutp = fp(vp, x, jax.random.key(1))
        np.testing.assert_allclose(np.asarray(yp2), np.asarray(yd2), atol=3e-4)
        sa = jtu.tree_leaves_with_path(mutp["batch_stats"])
        sb = jtu.tree_leaves_with_path(mutd["batch_stats"])
        for (k, a), (_, b) in zip(sa, sb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, err_msg=jtu.keystr(k))
