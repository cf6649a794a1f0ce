"""GPipe-style pipeline parallelism over transformer blocks.

The reference has no pipeline story (Lightning's ``devices`` int is unused —
SURVEY.md §2); this is part of the TPU-native parallelism obligation
(dp / fsdp / tp / cp / **pp** over a `jax.sharding.Mesh`). The design follows
the circular-schedule pipeline from the public scaling playbook:

  * the mesh's existing 'model' axis doubles as the pipeline axis — stage i
    holds blocks [i*depth/S, (i+1)*depth/S) as a leading-axis shard of a
    STACKED block-parameter pytree (the per-block trees are homogeneous);
  * inside one `jax.shard_map`, every tick runs each stage's blocks on its
    live microbatch and rotates activations one stage forward with
    `lax.ppermute` over ICI ring neighbours — no host involvement;
  * stage 0 feeds a fresh microbatch each tick, the last stage banks its
    result; after M + S - 1 ticks the banked outputs are replicated back
    over the pipe axis with one masked psum.

Everything is traced once under jit and is differentiable (ppermute's
transpose is the reverse rotation), so the same schedule serves inference
and the backward pass of training. The bubble fraction is the standard
(S-1)/(M+S-1) — callers pick ``n_microbatches`` accordingly.

Composes with data parallelism: batch stays sharded over 'data' while
activations rotate over the pipe axis. Not composed with tensor parallelism
of the same blocks (tp shards heads over the same 'model' axis; pick one per
run — asserted).
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from s2tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def stack_block_params(params: dict, prefix: str, depth: int) -> typing.Any:
    """Stack homogeneous per-block param subtrees (``<prefix>0..<prefix>{depth-1}``)
    into one pytree with a leading ``depth`` axis (sharded over the pipe axis
    by the pipeline's in_spec). Works on the live checkpoint layout — pipeline
    execution is a pure runtime strategy, no re-training or re-conversion."""
    subtrees = [params[f"{prefix}{i}"] for i in range(depth)]
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *subtrees)


def pipelined_block_apply(
    block_mod,
    stacked_params: typing.Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    n_microbatches: int,
    pipe_axis: str = MODEL_AXIS,
    data_axis: str | None = DATA_AXIS,
) -> jax.Array:
    """Run ``depth`` stacked blocks over ``x`` (B, L, D) as an S-stage pipeline.

    ``block_mod`` is a Flax module whose ``apply({'params': p}, x)`` maps
    (mb, L, D) -> (mb, L, D); ``stacked_params`` carries a leading ``depth``
    axis (see ``stack_block_params``). S = mesh.shape[pipe_axis]; each stage
    runs depth // S blocks per tick. The local (per data-shard) batch must be
    divisible by ``n_microbatches``.
    """
    s = mesh.shape[pipe_axis]
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert depth % s == 0, f"depth {depth} not divisible by {s} pipeline stages"
    bps = depth // s
    m = n_microbatches

    # (depth, ...) -> (S, bps, ...): leading axis sharded one stage per device.
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((s, bps) + a.shape[1:]), stacked_params
    )

    def stage_fn(stage_params, xm):
        for j in range(bps):
            p_j = jax.tree_util.tree_map(lambda a: a[j], stage_params)
            xm = block_mod.apply({"params": p_j}, xm)
        return xm

    def pipelined(staged_local, x_local):
        # staged_local: (1, bps, ...) — this device's stage. x_local: (B_loc, L, D).
        stage_params = jax.tree_util.tree_map(lambda a: a[0], staged_local)
        idx = jax.lax.axis_index(pipe_axis)
        b_loc = x_local.shape[0]
        assert b_loc % m == 0, f"local batch {b_loc} not divisible by {m} microbatches"
        mb = b_loc // m
        x_mb = x_local.reshape((m, mb) + x_local.shape[1:])

        perm = [(i, (i + 1) % s) for i in range(s)]

        def tick(carry, t):
            state, outputs = carry
            feed = jax.lax.dynamic_index_in_dim(x_mb, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            inp = jnp.where(idx == 0, feed, state)
            out = stage_fn(stage_params, inp)
            out_idx = jnp.clip(t - (s - 1), 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, out_idx, 0, keepdims=False)
            banked = jnp.where(jnp.logical_and(t >= s - 1, idx == s - 1), out, cur)
            outputs = jax.lax.dynamic_update_index_in_dim(outputs, banked, out_idx, 0)
            state = jax.lax.ppermute(out, pipe_axis, perm)
            return (state, outputs), None

        init = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
        (_, outputs), _ = jax.lax.scan(tick, init, jnp.arange(m + s - 1))
        # Replicate the last stage's banked outputs across the pipe axis.
        outputs = jax.lax.psum(
            jnp.where(idx == s - 1, outputs, jnp.zeros_like(outputs)), pipe_axis
        )
        return outputs.reshape(x_local.shape)

    x_spec = P(data_axis) if data_axis else P()
    return jax.shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P(pipe_axis), x_spec),
        out_specs=x_spec,
        check_vma=False,
    )(staged, x)


def prithvi_pipelined_encode(
    model,
    variables: dict,
    imgs: jax.Array,
    *,
    mesh: Mesh,
    n_microbatches: int,
    pipe_axis: str = MODEL_AXIS,
    data_axis: str | None = DATA_AXIS,
    mask_ratio: float = 0.0,
    mask_rng: jax.Array | None = None,
):
    """PrithviMAE.forward_encoder with the encoder blocks run as a pipeline.

    Numerically identical to the sequential encoder (same params, same block
    order — tests/test_pipeline_parallel.py asserts forward and grad parity);
    the checkpoint layout is untouched (block params are restacked at trace
    time). Requires cfg.tp_axis/cp_axis unset — tp shards heads over the same
    'model' axis the pipeline stages occupy.
    """
    from s2tpu.models.prithvi_mae import Block, PrithviMAE

    cfg = model.config
    assert cfg.tp_axis is None and cfg.cp_axis is None, (
        "pipeline parallelism and tensor/context parallelism both use the "
        "'model' axis — configure one per run"
    )
    x, mask, ids_restore = model.apply(
        variables, imgs, mask_ratio, mask_rng, method=PrithviMAE.encoder_pre
    )
    block = Block(
        cfg.embed_dim,
        cfg.num_heads,
        cfg.mlp_ratio,
        dtype=model.dtype,
        attention_impl=cfg.attention_impl,
        ln_eps=cfg.layer_norm_eps,
    )
    stacked = stack_block_params(variables["params"], "block_", cfg.depth)
    x = pipelined_block_apply(
        block,
        stacked,
        x,
        mesh=mesh,
        n_microbatches=n_microbatches,
        pipe_axis=pipe_axis,
        data_axis=data_axis,
    )
    x = model.apply(variables, x, method=PrithviMAE.encoder_post)
    return x, mask, ids_restore


def prithvi_pipelined_decode(
    model,
    variables: dict,
    tokens: jax.Array,
    ids_restore: jax.Array,
    *,
    mesh: Mesh,
    n_microbatches: int,
    pipe_axis: str = MODEL_AXIS,
    data_axis: str | None = DATA_AXIS,
) -> jax.Array:
    """PrithviMAE.forward_decoder with the decoder blocks run as a pipeline.

    Same runtime strategy as ``prithvi_pipelined_encode`` applied to the
    ``decoder_block_*`` stack (different width/head-count Block instance);
    embed/unshuffle/pos run replicated before, norm+pred after. Requires
    ``decoder_depth % n_stages == 0`` (Prithvi-100M: 8 decoder blocks →
    stages ∈ {2, 4, 8})."""
    from s2tpu.models.prithvi_mae import Block, PrithviMAE

    cfg = model.config
    assert cfg.tp_axis is None and cfg.cp_axis is None, (
        "pipeline parallelism and tensor/context parallelism both use the "
        "'model' axis — configure one per run"
    )
    x = model.apply(variables, tokens, ids_restore, method=PrithviMAE.decoder_pre)
    block = Block(
        cfg.decoder_embed_dim,
        cfg.decoder_num_heads,
        cfg.mlp_ratio,
        dtype=model.dtype,
        attention_impl=cfg.attention_impl,
        ln_eps=cfg.layer_norm_eps,
    )
    stacked = stack_block_params(variables["params"], "decoder_block_", cfg.decoder_depth)
    x = pipelined_block_apply(
        block,
        stacked,
        x,
        mesh=mesh,
        n_microbatches=n_microbatches,
        pipe_axis=pipe_axis,
        data_axis=data_axis,
    )
    return model.apply(variables, x, method=PrithviMAE.decoder_post)


def prithvi_pipelined_mae_forward(
    model,
    variables: dict,
    imgs: jax.Array,
    *,
    mesh: Mesh,
    n_microbatches: int,
    pipe_axis: str = MODEL_AXIS,
    data_axis: str | None = DATA_AXIS,
    mask_ratio: float = 0.75,
    mask_rng: jax.Array | None = None,
):
    """Full MAE forward (loss, pred, mask) with the encoder — and, when the
    stage count divides ``decoder_depth``, the decoder — pipelined.

    Drop-in replacement for ``PrithviMAE.__call__`` used by the MAE train
    step under pipeline parallelism: the 12-block encoder and the 8-block
    decoder (together the bulk of the FLOPs) run as pipe stages over the
    'model' axis; embed/unshuffle/loss run replicated (the standard cost of
    pipelining only the block stacks). When ``decoder_depth % stages != 0``
    (e.g. 3 stages over Prithvi's 8 decoder blocks) the decoder falls back
    to the sequential path. Differentiable end to end; tests assert
    train-step equality against the sequential model.
    """
    from s2tpu.models.prithvi_mae import PrithviMAE, patchify
    from s2tpu.train.losses import mae_reconstruction_loss

    latent, mask, ids_restore = prithvi_pipelined_encode(
        model,
        variables,
        imgs,
        mesh=mesh,
        n_microbatches=n_microbatches,
        pipe_axis=pipe_axis,
        data_axis=data_axis,
        mask_ratio=mask_ratio,
        mask_rng=mask_rng,
    )
    cfg = model.config
    if cfg.decoder_depth % mesh.shape[pipe_axis] == 0:
        pred = prithvi_pipelined_decode(
            model,
            variables,
            latent,
            ids_restore,
            mesh=mesh,
            n_microbatches=n_microbatches,
            pipe_axis=pipe_axis,
            data_axis=data_axis,
        )
    else:
        pred = model.apply(variables, latent, ids_restore, method=PrithviMAE.forward_decoder)
    target = patchify(imgs, cfg.patch_size, cfg.tubelet_size)
    loss = mae_reconstruction_loss(pred, target, mask, norm_pix=cfg.norm_pix_loss)
    return loss, pred, mask
