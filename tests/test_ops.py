"""Pallas kernel tests (interpret mode on CPU) vs XLA/torch-parity oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2tpu.ops.flash_attention import _reference_attention, flash_attention
from s2tpu.ops.fused_ce import fused_cross_entropy, fused_focal_loss
from s2tpu.train import losses


@pytest.mark.parametrize("b,l,h,d", [(1, 256, 2, 64), (2, 200, 4, 32)])
def test_flash_attention_matches_reference(rng, b, l, h, d):
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    out = flash_attention(q, k, v, 128, 128, True)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_attention_padding_correct(rng):
    # l=100 forces padding to 128; padded keys must not leak into softmax
    q = jnp.asarray(rng.normal(size=(1, 100, 1, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 100, 1, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 100, 1, 32)).astype(np.float32))
    out = flash_attention(q, k, v, 128, 128, True)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_attention_grad_via_fallback(rng):
    q = jnp.asarray(rng.normal(size=(1, 64, 1, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 64, 1, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 64, 1, 16)).astype(np.float32))

    g1 = jax.grad(lambda q: (flash_attention(q, k, v, 64, 64, True) ** 2).sum())(q)
    g2 = jax.grad(lambda q: (_reference_attention(q, k, v) ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "b,l,h,d,g",
    [
        (2, 197, 4, 32, 8),  # MAE decoder shape (L pads to 256), head_group > B*H folds down
        (2, 50, 3, 64, 2),   # MAE masked-encoder shape
        (1, 128, 2, 16, 2),
    ],
)
def test_fused_attention_matches_reference(rng, b, l, h, d, g):
    from s2tpu.ops.flash_attention import fused_attention

    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    out = fused_attention(q, k, v, g, True)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_attention_grads_match_reference(rng):
    """Pallas backward (dq, dk, dv) vs XLA attention autodiff — the training
    path's correctness gate (non-multiple-of-128 L exercises the row/key
    padding masks in bwd)."""
    from s2tpu.ops.flash_attention import fused_attention

    b, l, h, d = 2, 197, 2, 32
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))

    def loss_fused(q, k, v):
        return (fused_attention(q, k, v, 4, True) * cot).sum()

    def loss_ref(q, k, v):
        return (_reference_attention(q, k, v) * cot).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "q k v".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4, err_msg=f"d{name}"
        )


def test_fused_attention_dense_fwd_and_grads(rng):
    """fused_attention_dense (head split in-kernel on the raw (B, L, 3D)
    Dense output) vs XLA attention: forward + dqkv through the custom VJP.
    L=197 exercises the MAE decoder geometry (D_h=32 lane slices)."""
    from s2tpu.ops.flash_attention import fused_attention_dense

    b, l, h, dh = 2, 197, 4, 32
    dim = h * dh
    qkv = jnp.asarray(rng.normal(size=(b, l, 3 * dim)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(b, l, dim)).astype(np.float32))

    def ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, h, dh)
        k = k.reshape(b, l, h, dh)
        v = v.reshape(b, l, h, dh)
        return _reference_attention(q, k, v).reshape(b, l, dim)

    out = fused_attention_dense(qkv, h, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(qkv)), rtol=2e-4, atol=2e-5)

    g1 = jax.grad(lambda x: (fused_attention_dense(x, h, True) * cot).sum())(qkv)
    g2 = jax.grad(lambda x: (ref(x) * cot).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)


def test_fused_fits_vmem_geometry():
    """VMEM-aware fused-attention routing: the published Prithvi geometries
    that fit Mosaic's 16 MB scoped-vmem budget stay fused; the T=4 decoder
    (L=785, D=512 — the bwd kernel's footprint is ~24 MB, the exact OOM
    Mosaic reported) must route to the streaming flash path."""
    from s2tpu.ops.flash_attention import fused_fits_vmem

    assert fused_fits_vmem(197, 512, 16)  # T=1 decoder
    assert fused_fits_vmem(197, 768, 12)  # T=4 masked encoder
    assert fused_fits_vmem(393, 512, 16)  # T=2 decoder
    assert not fused_fits_vmem(785, 512, 16)  # T=4 decoder -> flash
    assert not fused_fits_vmem(1024, 768, 12)


def test_fused_routing_vmem_fallback_matches_xla(rng):
    """At a geometry the fused kernel cannot hold in VMEM (L=589 under the
    test-sized budget check we emulate with the real one: use L>=512 so the
    flash path is taken), impl='fused' must still produce XLA-equal output
    through the flash fallback inside Attention."""
    from s2tpu.models.prithvi_mae import Attention
    from s2tpu.ops.flash_attention import fused_fits_vmem

    b, l, h, dh = 1, 785, 16, 32
    dim = h * dh
    assert not fused_fits_vmem(l, dim, h)
    x = jnp.asarray(rng.normal(size=(b, l, dim)).astype(np.float32))
    fused = Attention(dim=dim, num_heads=h, impl="fused")
    xla = Attention(dim=dim, num_heads=h, impl="xla")
    params = fused.init(jax.random.key(0), x)
    out_f = fused.apply(params, x)
    out_x = xla.apply(params, x)  # identical param tree (Dense qkv/proj)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=2e-3, atol=2e-3)
    # grads flow through the flash custom-VJP fallback
    g = jax.grad(lambda p: fused.apply(p, x).sum())(params)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_fused_attention_in_prithvi_block(rng):
    """attention_impl='fused' must reproduce the 'xla' forward through a full
    PrithviMAE (same params, same masking rng). Token counts chosen so both
    the masked encoder (L=129) and the decoder (L=257) sit above
    FUSED_MIN_LEN and actually route through the Pallas kernels — also
    proves the einsum qkv/proj parameterization is checkpoint-compatible
    with the Dense path (identical param trees)."""
    import dataclasses

    from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE
    from s2tpu.ops.flash_attention import FUSED_MIN_LEN

    cfg = PrithviConfig(
        img_size=64, patch_size=4, num_frames=1, tubelet_size=1, in_chans=6,
        embed_dim=64, depth=2, num_heads=4, decoder_embed_dim=32,
        decoder_depth=1, decoder_num_heads=2,
    )
    assert cfg.num_patches // 2 + 1 >= FUSED_MIN_LEN  # encoder at mask 0.5
    x = jnp.asarray(rng.normal(size=(2, 1, 64, 64, 6)).astype(np.float32))
    model = PrithviMAE(cfg)
    variables = model.init({"params": jax.random.key(0)}, x, mask_ratio=0.0)
    model_fused = PrithviMAE(dataclasses.replace(cfg, attention_impl="fused"))
    with jax.default_matmul_precision("highest"):
        loss_a, pred_a, _ = model.apply(variables, x, mask_ratio=0.5, mask_rng=jax.random.key(1))
        loss_b, pred_b, _ = model_fused.apply(variables, x, mask_ratio=0.5, mask_rng=jax.random.key(1))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_a), np.asarray(pred_b), rtol=1e-3, atol=1e-4)


@pytest.fixture(scope="module")
def ce_data():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(2, 24, 24, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, size=(2, 24, 24)).astype(np.int32))
    return logits, labels


def test_fused_ce_matches_reference(ce_data):
    logits, labels = ce_data
    ours = fused_cross_entropy(logits, labels, interpret=True)
    ref = losses.cross_entropy(logits, labels)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_fused_ce_weighted_masked(ce_data):
    logits, labels = ce_data
    w = jnp.asarray([0.0, 0.7, 0.5, 0.8])
    ours = fused_cross_entropy(logits, labels, class_weights=w, ignore_index=0, interpret=True)
    ref = losses.cross_entropy(logits, labels, class_weights=w, ignore_index=0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_fused_ce_gradient(ce_data):
    logits, labels = ce_data
    w = jnp.asarray([0.0, 0.7, 0.5, 0.8])
    g1 = jax.grad(
        lambda lg: fused_cross_entropy(lg, labels, class_weights=w, ignore_index=0, interpret=True)
    )(logits)
    g2 = jax.grad(
        lambda lg: losses.cross_entropy(lg, labels, class_weights=w, ignore_index=0)
    )(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6)


def test_fused_focal_matches_reference(ce_data):
    logits, labels = ce_data
    alpha = jnp.ones(4)
    ours = fused_focal_loss(logits, labels, alpha, gamma=2.0, ignore_index=0, interpret=True)
    ref = losses.focal_loss(logits, labels, alpha, gamma=2.0, ignore_index=0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_fused_focal_gradient(ce_data):
    logits, labels = ce_data
    alpha = jnp.asarray([1.0, 0.5, 0.25, 2.0])
    g1 = jax.grad(
        lambda lg: fused_focal_loss(lg, labels, alpha, gamma=2.0, ignore_index=0, interpret=True)
    )(logits)
    g2 = jax.grad(
        lambda lg: losses.focal_loss(lg, labels, alpha, gamma=2.0, ignore_index=0)
    )(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-6)


def test_fused_ce_nonuniform_cotangent(ce_data):
    """The VJP must honor a full per-pixel cotangent, not assume a uniform
    sum/mean reduction (callers may weight the per-pixel outputs)."""
    logits, labels = ce_data
    from s2tpu.ops.fused_ce import fused_ce_per_pixel

    w = jnp.asarray([0.0, 0.7, 0.5, 0.8])
    n_real = labels.size
    pixw = jnp.asarray(np.random.default_rng(7).uniform(size=n_real).astype(np.float32))

    def ours(lg):
        loss, _ = fused_ce_per_pixel(lg, labels, w, 0, None, True)
        return (loss[:n_real] * pixw).sum()

    def ref(lg):
        ls = jax.nn.log_softmax(lg, -1)
        ce = -jnp.take_along_axis(ls, labels[..., None], -1)[..., 0]
        per = ce * w[labels] * (labels != 0)
        return (per.reshape(-1) * pixw).sum()

    g1 = jax.grad(ours)(logits)
    g2 = jax.grad(ref)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_fused_ce_large_class_count(rng):
    """K=24 (cnes-full) exercises sublane padding in the transposed layout."""
    logits = jnp.asarray(rng.normal(size=(2, 16, 16, 24)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 24, size=(2, 16, 16)).astype(np.int32))
    ours = fused_cross_entropy(logits, labels, ignore_index=0, interpret=True)
    ref = losses.cross_entropy(logits, labels, ignore_index=0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    g1 = jax.grad(lambda lg: fused_cross_entropy(lg, labels, ignore_index=0, interpret=True))(logits)
    g2 = jax.grad(lambda lg: losses.cross_entropy(lg, labels, ignore_index=0))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6)


def test_fused_attention_dense_paired_matches(monkeypatch):
    """S2TPU_FUSED_PAIRED=1 (two heads per MXU pass, VERDICT r3 #7 experiment)
    is numerically identical to the per-head kernel."""
    import numpy as np

    from s2tpu.ops.flash_attention import fused_attention_dense

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(2, 197, 3 * 16 * 32)).astype(np.float32))
    base = fused_attention_dense(qkv, 16, interpret=True)
    monkeypatch.setenv("S2TPU_FUSED_PAIRED", "1")
    paired = fused_attention_dense(qkv, 16, interpret=True)
    np.testing.assert_allclose(np.asarray(paired), np.asarray(base), rtol=0, atol=0)
