"""Prithvi MAE pretraining / finetuning trainer.

The TPU-native replacement for reference train_mae_prithvi.py:37-242: a
jit'd train step over a data-parallel mesh whose loss is the model-internal
masked-reconstruction MSE, with the MAE linear LR-scaling rule applied at
config time (s2tpu.configs.mae.pretrain/finetune), normalization with the
published Prithvi mean/std, and Orbax checkpoints monitored on val loss.

``from_scratch=False`` starts from converted Prithvi_100M.pt weights when
present under weights/ (s2tpu.checkpoint.convert_torch); otherwise a warning
is logged and training starts from random init.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from s2tpu.configs.mae import MAEConfig
from s2tpu.data.augment import augment_batch
from s2tpu.data.pipeline import Datamodule, prefetch_to_device
from s2tpu.models.prithvi_mae import PrithviConfig, PrithviMAE, unpatchify
from s2tpu.parallel import mesh as mesh_lib
from s2tpu.train.train_state import (
    EmaState,
    TrainState,
    cast_floats,
    make_optimizer,
    with_f32_master,
    with_param_ema,
)
from s2tpu.train.trainer import PreemptionInterrupt, preempt_requested
from s2tpu.utils import get_logger, get_unique_run_name, load_prithvi_mean_std, load_prithvi_model_args

logger = get_logger(__name__)


class MAETrainer:
    def __init__(
        self,
        config: MAEConfig,
        datamodule: Datamodule,
        mesh: jax.sharding.Mesh | None = None,
        model_config: PrithviConfig | None = None,
        run_logger=None,
        checkpoint_manager=None,
        mask_ratio: float = 0.75,
    ) -> None:
        self.config = config
        self.dm = datamodule
        if mesh is None:
            # pipeline_stages > 1 needs a matching model-axis; otherwise the
            # default pure-data mesh.
            pp_stages = max(getattr(config.model, "pipeline_stages", 1), 1)
            mesh = mesh_lib.make_mesh(config.train.num_devices, model_parallel=pp_stages)
        self.mesh = mesh
        self.mask_ratio = config.model.mask_ratio if config.model.mask_ratio is not None else mask_ratio
        self.run_logger = run_logger
        self.ckpt = checkpoint_manager
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[config.train.compute_dtype]

        if model_config is None:
            # Non-224 crops resize the token grid; sincos pos-embeds are
            # regenerated for the runtime size (reference utils.py:62-96
            # does the same surgery when num_frames changes).
            model_config = PrithviConfig.from_model_args(
                load_prithvi_model_args(),
                num_frames=config.model.num_frames,
                img_size=config.datamodule.random_crop_size,
            )
            import dataclasses

            model_config = dataclasses.replace(
                model_config,
                attention_impl=getattr(config.model, "attention_impl", "xla"),
                norm_pix_loss=config.model.norm_pix_loss,
                in_chans=getattr(config.datamodule.dataset_cfg, "in_channels", 6),
            )
        self.model = PrithviMAE(model_config, dtype=dtype)
        self.model_config = model_config

        from s2tpu.configs.data_config import BANDS as PRITHVI_BANDS
        from s2tpu.configs.data_config import parse_bands

        cfg_bands = parse_bands(
            getattr(config.datamodule.dataset_cfg, "bands", PRITHVI_BANDS)
        )
        if cfg_bands == list(PRITHVI_BANDS):
            mean, std = load_prithvi_mean_std()  # published Prithvi normalization
        else:
            # Any other band set — including 6-band sets that are NOT the
            # Prithvi-HLS six (band IDENTITY, not count, is what the
            # published statistics belong to): use dataset Welford stats.
            mean, std = datamodule.mean_std()
            assert len(mean) == model_config.in_chans, (
                f"dataset statistics carry {len(mean)} channels but the model expects "
                f"{model_config.in_chans} — the rasters were acquired with a different band set"
            )
        self.mean = jnp.asarray(mean)
        self.std = jnp.asarray(std)
        self.compute_dtype = dtype

        self.base_rng = jax.random.key(config.train.seed)
        self._host_step = 0  # host mirror of state.step (watch gating, no sync)
        self._preempt_requested = False  # set by the SIGTERM handler (fit)
        self._skip_batches = 0  # mid-epoch resume: batches to skip (exact replay)
        self._resumed_from_preempt = False  # this run consumed the preempt marker
        self.corpus = None
        if getattr(config.train, "device_corpus", False):
            sharded = getattr(config.train, "device_corpus_sharded", False)
            assert jax.process_count() == 1 or sharded, (
                "multi-host MAE device_corpus requires device_corpus_sharded "
                "(per-host HBM blocks); the replicated corpus is single-process"
            )
            from s2tpu.data.device_corpus import DeviceCorpus

            # Unlabeled corpus: skip the label upload entirely.
            self.corpus = DeviceCorpus(
                datamodule.source, mesh=self.mesh, shard=sharded, with_labels=False
            )
        self._ema_cast = None  # jitted EMA->working-dtype cast, built lazily
        self.state = self._init_state()
        self._build_steps()

    def _eval_params(self):
        """Params for validation/reconstruction logging: the EMA (cast to the
        working dtype) when ``train.ema_decay`` is set, live params otherwise."""
        opt = self.state.opt_state
        if not isinstance(opt, EmaState):
            return self.state.params
        if self._ema_cast is None:
            # out_shardings pinned to the params' layout — see the matching
            # comment in trainer.py::_eval_params (ADVICE r4).
            self._ema_cast = jax.jit(
                lambda ema, params: jax.tree_util.tree_map(
                    lambda e, p: e.astype(p.dtype), ema, params
                ),
                out_shardings=jax.tree_util.tree_map(
                    lambda p: p.sharding, self.state.params
                ),
            )
        return self._ema_cast(opt.ema, self.state.params)

    def eval_state(self) -> TrainState:
        """Same structure as ``self.state`` (jitted programs are shared) with
        EMA params substituted when ``train.ema_decay`` is set."""
        p = self._eval_params()
        return self.state if p is self.state.params else self.state.replace(params=p)

    def _init_state(self) -> TrainState:
        cfg = self.config
        crop = cfg.datamodule.random_crop_size
        sample = jnp.zeros(
            (1, self.model_config.num_frames, crop, crop, self.model_config.in_chans),
            self.compute_dtype,
        )

        @jax.jit
        def init():
            return self.model.init(
                {"params": jax.random.key(cfg.train.seed)}, sample, mask_ratio=0.0
            )

        params = init()["params"]
        if not cfg.train.from_scratch:
            params = self._load_pretrained(params)
        self.tx = make_optimizer(
            cfg.train.lr, cfg.train.weight_decay, cfg.train.betas
        )
        self._mixed_params = getattr(cfg.train, "param_dtype", "float32") == "bfloat16"
        if self._mixed_params:
            self.tx = with_f32_master(self.tx)
        if getattr(cfg.train, "ema_decay", None):
            # Outermost: the EMA tracks the final post-update params.
            self.tx = with_param_ema(self.tx, cfg.train.ema_decay)
        opt_state = jax.jit(self.tx.init)(params)
        if self._mixed_params:
            params = cast_floats(params, jnp.bfloat16)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats={}, opt_state=opt_state
        )
        return mesh_lib.replicate_pytree(state, self.mesh)

    def _load_pretrained(self, params):
        """Converted Prithvi_100M.pt weights when available (finetune path)."""
        if self.model_config.in_chans != 6:
            logger.warning(
                f"in_chans={self.model_config.in_chans}: the published Prithvi_100M.pt "
                "is a 6-band model — training from random init (use --from-scratch to "
                "silence this)"
            )
            return params
        try:
            from s2tpu.checkpoint.convert_torch import load_prithvi_weights

            return load_prithvi_weights(params, num_frames=self.model_config.num_frames)
        except FileNotFoundError as e:
            logger.warning(f"Pretrained Prithvi weights unavailable ({e}); using random init")
            return params

    def _build_steps(self) -> None:
        cfg = self.config
        model = self.model
        mask_ratio = self.mask_ratio
        dm_cfg = cfg.datamodule

        accum = max(cfg.train.grad_accum_steps, 1)
        watch = self.run_logger is not None and cfg.train.watch_interval > 0

        pp = max(getattr(cfg.model, "pipeline_stages", 1), 1)
        if pp > 1:
            assert self.mesh.shape[mesh_lib.MODEL_AXIS] == pp, (
                f"pipeline_stages={pp} needs a mesh with model-axis size {pp}, "
                f"got {dict(self.mesh.shape)}"
            )
            assert self.model_config.tp_axis is None, (
                "pipeline and tensor parallelism both use the 'model' axis — "
                "configure one per run"
            )

        def model_forward(params, x, mask_key):
            """(loss, pred, mask) — sequential, or encoder-pipelined when
            pipeline_stages > 1 (s2tpu/parallel/pipeline.py)."""
            if pp <= 1:
                return model.apply(
                    {"params": params}, x, mask_ratio=mask_ratio, mask_rng=mask_key
                )
            from s2tpu.parallel.pipeline import prithvi_pipelined_mae_forward

            return prithvi_pipelined_mae_forward(
                model, {"params": params}, x, mesh=self.mesh,
                n_microbatches=getattr(cfg.model, "pipeline_microbatches", 2),
                mask_ratio=mask_ratio, mask_rng=mask_key,
            )

        # remat: recompute block activations in the backward pass instead of
        # saving them — trades FLOPs for HBM (large crops / deep stacks).
        grad_forward = (
            jax.checkpoint(model_forward) if cfg.train.remat else model_forward
        )

        def micro_grads(params, images, micro_rng):
            aug_key, mask_key = jax.random.split(micro_rng)
            x, _ = augment_batch(
                images, None, aug_key, self.mean, self.std,
                dtype=self.compute_dtype, train=dm_cfg.augment,
            )
            x = x[:, None] if x.ndim == 4 else x  # add T axis

            def loss_fn(params):
                loss, _, _ = grad_forward(params, x, mask_key)
                return loss

            return jax.value_and_grad(loss_fn)(params)

        def train_step(state: TrainState, images, rng):
            step_rng = jax.random.fold_in(rng, state.step)
            if accum == 1:
                loss, grads = micro_grads(state.params, images, step_rng)
            else:
                mb = images.shape[0] // accum
                imgs = images.reshape(accum, mb, *images.shape[1:])

                def body(carry, xs):
                    gsum, lsum = carry
                    im, i = xs
                    loss_i, grads_i = micro_grads(state.params, im, jax.random.fold_in(step_rng, i))
                    return (
                        jax.tree_util.tree_map(lambda a, g: a + g.astype(a.dtype), gsum, grads_i),
                        lsum + loss_i,
                    ), None

                # f32 accumulation regardless of param storage dtype.
                zeros_g = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32) if jnp.issubdtype(p.dtype, jnp.floating) else jnp.zeros_like(p),
                    state.params,
                )
                (gsum, lsum), _ = jax.lax.scan(
                    body, (zeros_g, jnp.zeros((), jnp.float32)), (imgs, jnp.arange(accum))
                )
                grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
                loss = lsum / accum
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            # with_f32_master returns the new bf16 params (NewParams wrapper).
            new_params = updates.tree if self._mixed_params else optax.apply_updates(state.params, updates)
            out = {"loss": loss}
            if watch:
                from s2tpu.train.trainer import _watch_norms

                out["watch"] = _watch_norms(grads, new_params)
            return (
                state.replace(step=state.step + 1, params=new_params, opt_state=new_opt),
                out,
            )

        def eval_step(state: TrainState, images, batch_mask, rng):
            x, _ = augment_batch(
                images, None, rng, self.mean, self.std, dtype=self.compute_dtype, train=False
            )
            x = x[:, None] if x.ndim == 4 else x
            _, pred, mask = model_forward(state.params, x, rng)
            # Recompute the loss with padded rows excluded from numerator AND
            # denominator — the model-internal mean includes padded zero
            # images, so weighting that scalar afterwards would not remove
            # their contribution.
            from s2tpu.models.prithvi_mae import patchify
            from s2tpu.train.losses import mae_reconstruction_loss

            mc = self.model_config
            target = patchify(x, mc.patch_size, mc.tubelet_size)
            loss = mae_reconstruction_loss(
                pred, target, mask, norm_pix=mc.norm_pix_loss,
                sample_weights=batch_mask,
            )
            per_ok = batch_mask.astype(jnp.float32)
            return {"loss": loss, "weight": per_ok.mean(), "pred": pred, "mask": mask}

        if self.corpus is not None and self.corpus.sharded:
            from s2tpu.data.device_corpus import sharded_image_gather

            gather = sharded_image_gather(self.mesh, dm_cfg.random_crop_size)
        else:

            def gather(corpus_images, idx, ys, xs):
                from s2tpu.data.device_corpus import crop_slice_images

                crop = dm_cfg.random_crop_size

                def one(i, y, x):
                    return crop_slice_images(corpus_images, i, y, x, crop)

                return jax.vmap(one)(idx, ys, xs)

        def train_step_indexed(state, corpus_images, idx, ys, xs, rng):
            """Device-corpus step: the on-device crop gather makes idx/ys/xs
            the only per-step host->device traffic (unlabeled corpus; the
            sharded variant crops shard-locally under shard_map)."""
            images = gather(corpus_images, idx, ys, xs)
            return train_step(state, images, rng)

        def train_step_indexed_multi(state, corpus_images, idx, ys, xs, rng):
            """``steps_per_dispatch`` fused steps (idx/ys/xs are (K, B)): one
            XLA program runs K optimizer steps via lax.scan over the donated
            state — per-step RNG still folds on state.step, so the math is
            identical to K single dispatches. Returns the K-summed loss."""

            def body(st, per):
                i, y, x = per
                st, m = train_step_indexed(st, corpus_images, i, y, x, rng)
                return st, m["loss"]

            state, losses = jax.lax.scan(body, state, (idx, ys, xs))
            return state, {"loss": jnp.sum(losses)}

        donate = ("state",) if cfg.train.donate_state else ()
        self.train_step = jax.jit(train_step, donate_argnames=donate)
        self.train_step_indexed = jax.jit(train_step_indexed, donate_argnames=donate)
        self.train_step_indexed_multi = jax.jit(train_step_indexed_multi, donate_argnames=donate)
        self.eval_step = jax.jit(eval_step)

    def reconstruct(self, images) -> np.ndarray:
        """Visualization helper: masked reconstruction back in pixel space."""
        x, _ = augment_batch(
            jnp.asarray(images), None, jax.random.key(0), self.mean, self.std,
            dtype=self.compute_dtype, train=False,
        )
        x = x[:, None] if x.ndim == 4 else x
        _, pred, _ = self.model.apply(
            {"params": self._eval_params()}, x, mask_ratio=self.mask_ratio,
            mask_rng=jax.random.key(1),
        )
        mc = self.model_config
        rec = unpatchify(pred, mc.grid_size, mc.patch_size, mc.tubelet_size, mc.in_chans)
        rec = np.asarray(rec.astype(jnp.float32))
        return rec * np.asarray(self.std) + np.asarray(self.mean)  # denormalize

    def run_train_epoch(self, epoch: int) -> dict:
        cfg = self.config
        acc, n, images_seen = None, 0, 0
        t0 = time.time()
        wi = cfg.train.watch_interval
        # Mid-epoch resume after preemption: the per-epoch batch/draw stream
        # is deterministic, so skipping the already-trained prefix continues
        # the epoch exactly.
        skip = self._skip_batches
        self._skip_batches = 0
        if self.corpus is not None:
            from s2tpu.data.device_corpus import sample_crop_batch
            from s2tpu.data.pipeline import epoch_rng, sample_epoch_order

            bs = cfg.datamodule.batch_size
            overfit = cfg.train.overfit_batches
            rng = epoch_rng(cfg.datamodule.shuffle_seed, epoch, overfit)
            crop = cfg.datamodule.random_crop_size
            random_crop = cfg.datamodule.augment and overfit == 0
            if self.corpus.sharded:
                from s2tpu.data.device_corpus import (
                    sample_sharded_crop_batch,
                    sharded_epoch_orders,
                )

                d = self.mesh.shape[mesh_lib.DATA_AXIS]
                assert bs % d == 0, (bs, d)
                per = bs // d
                orders, n_batches = sharded_epoch_orders(
                    rng, self.corpus.shard_pools(self.dm.train_idx), per, overfit
                )
                sample = lambda b: sample_sharded_crop_batch(  # noqa: E731
                    rng, orders, b, per, self.corpus.hw, crop, random_crop
                )
            else:
                order, n_batches = sample_epoch_order(rng, self.dm.train_idx, None, bs, overfit)
                sample = lambda b: sample_crop_batch(  # noqa: E731
                    rng, order, b, bs, self.corpus.hw, crop, random_crop
                )

            def corpus_batches():
                multi_proc = jax.process_count() > 1
                for b in range(skip, n_batches):
                    idx, ys, xs = sample(b)
                    if multi_proc:
                        # Same global draws everywhere; ship only our slice
                        # and assemble global (B,) vectors over the mesh.
                        from s2tpu.parallel.multihost import local_slice, put_batch

                        sl = local_slice(len(idx))
                        sharding = mesh_lib.data_sharding(self.mesh)
                        idx, ys, xs = (put_batch(a[sl], sharding) for a in (idx, ys, xs))
                    yield idx, ys, xs

            # Replay the deterministic draw stream for the skipped prefix
            # (keeps the host RNG aligned for the remaining batches).
            for j in range(min(skip, n_batches)):
                sample(j)

            k = max(getattr(cfg.train, "steps_per_dispatch", 1), 1)
            watch_on = self.run_logger is not None and wi > 0
            if k > 1 and not watch_on and jax.process_count() == 1:
                # Fused windows: one program per k optimizer steps; the host
                # ships (k, B) index vectors once per window. Remainder
                # batches (< k) run as single steps.
                acc, n, images_seen = None, 0, 0
                b = skip
                while b < n_batches:
                    if b + k <= n_batches:
                        draws = [sample(b + j) for j in range(k)]
                        idx, ys, xs = (np.stack([d[t] for d in draws]) for t in range(3))
                        self.state, m = self.train_step_indexed_multi(
                            self.state, self.corpus.images, idx, ys, xs, self.base_rng
                        )
                        took = k
                    else:
                        self.state, m = self.train_step_indexed(
                            self.state, self.corpus.images, *sample(b), self.base_rng
                        )
                        took = 1
                    acc = m["loss"] if acc is None else acc + m["loss"]
                    n += took
                    images_seen += bs * took
                    self._host_step += took
                    b += took
                    # b == n_batches: the epoch just finished — let it
                    # complete rather than resume into a zero-batch epoch.
                    if b < n_batches and preempt_requested(self):
                        raise PreemptionInterrupt(epoch, b)
                if n == 0:
                    if skip:  # resumed epoch with no remaining batches
                        return {"loss": float("nan"), "images_per_sec": 0.0}
                    raise ValueError(
                        f"train epoch {epoch} produced ZERO batches: the train pool "
                        f"({len(self.dm.train_idx)} segments) is smaller than one "
                        f"global batch ({bs}) — reduce --bs, the device count, or "
                        "grow the dataset/split"
                    )
                return {
                    "loss": float(acc) / n,
                    "images_per_sec": images_seen / max(time.time() - t0, 1e-9),
                }

            batches = corpus_batches()
            step = lambda b: self.train_step_indexed(  # noqa: E731
                self.state, self.corpus.images, *b, self.base_rng
            )
            batch_size_of = lambda b: bs  # noqa: E731
        else:
            batches = prefetch_to_device(
                self.dm.train_batches(
                    epoch, overfit_batches=cfg.train.overfit_batches, start=skip
                ),
                sharding=mesh_lib.data_sharding(self.mesh),
                depth=cfg.datamodule.prefetch,
            )
            step = lambda b: self.train_step(self.state, b.images, self.base_rng)  # noqa: E731
            batch_size_of = lambda b: b.images.shape[0]  # noqa: E731
        from s2tpu.train.trainer import _with_is_last

        for batch, is_last in _with_is_last(batches):
            self.state, m = step(batch)
            acc = m["loss"] if acc is None else acc + m["loss"]
            n += 1
            images_seen += batch_size_of(batch)
            self._host_step += 1
            if (
                self.run_logger is not None and wi > 0
                and self._host_step % wi == 0 and "watch" in m
            ):
                self.run_logger.log_scalars(
                    {k: float(v) for k, v in m["watch"].items()}, step=self._host_step
                )
            if not is_last and preempt_requested(self):
                raise PreemptionInterrupt(epoch, skip + n)
        if n == 0:
            if skip:  # resumed epoch with no remaining batches
                return {"loss": float("nan"), "images_per_sec": 0.0}
            raise ValueError(
                f"train epoch {epoch} produced ZERO batches: the train pool "
                f"({len(self.dm.train_idx)} segments) is smaller than one "
                f"global batch ({cfg.datamodule.batch_size}) — reduce --bs, "
                "the device count, or grow the dataset/split"
            )
        return {
            "loss": float(acc) / n,
            "images_per_sec": images_seen / max(time.time() - t0, 1e-9),
        }

    def run_eval_epoch(self, split: str = "val") -> dict:
        total, weight = 0.0, 0.0
        it = prefetch_to_device(
            self.dm.eval_batches(split), sharding=mesh_lib.data_sharding(self.mesh), depth=2
        )
        state = self.eval_state()
        for batch in it:
            m = self.eval_step(
                state, batch.images, batch.mask.astype(np.float32), self.base_rng
            )
            w = float(m["weight"])
            total += float(m["loss"]) * w
            weight += w
        return {"loss": total / max(weight, 1e-9)} if weight else {}

    def resume_from_checkpoint(self, epoch: int | None = None) -> int:
        """Restore from the attached checkpoint manager; returns the epoch to
        continue from (0 when no checkpoint exists). Crash-resume parity with
        the segmentation trainer."""
        assert self.ckpt is not None, "resume requires a checkpoint manager"
        if epoch is None and self.ckpt.has_preempt():
            # Exact mid-epoch continuation from a preemption save.
            self.state, pepoch, done = self.ckpt.restore_preempt(self.state)
            self._host_step = int(self.state.step)
            self._skip_batches = done
            self._resumed_from_preempt = True  # gates clear_preempt in _fit_loop
            logger.info(
                f"Resumed MAE training from preemption checkpoint: epoch {pepoch}, "
                f"{done} batches already trained (exact continuation)"
            )
            return pepoch
        latest = epoch if epoch is not None else self.ckpt.latest_epoch()
        if latest is None:
            return 0
        self.state = self.ckpt.restore(self.state, epoch=latest)
        self._host_step = int(self.state.step)
        logger.info(f"Resumed MAE training from epoch {latest} (step {self._host_step})")
        return latest + 1

    def fit(self, epochs: int | None = None, start_epoch: int = 0) -> list[dict]:
        cfg = self.config
        max_epochs = epochs if epochs is not None else cfg.train.max_epochs
        assert max_epochs > 0, "fit() needs an explicit positive epoch count"
        if cfg.train.run_name is None:
            cfg.train.run_name = get_unique_run_name(postfix=cfg.train.project_name)
        history = []
        from s2tpu.train.trainer import install_preempt_handler, restore_preempt_handler

        prev_handler = install_preempt_handler(self)
        try:
            return self._fit_loop(start_epoch, max_epochs, history)
        finally:
            restore_preempt_handler(prev_handler)

    def _fit_loop(self, start_epoch: int, max_epochs: int, history: list) -> list[dict]:
        cfg = self.config
        for epoch in range(start_epoch, max_epochs):
            try:
                if preempt_requested(self):  # arrived between epochs / during eval
                    # Preserve a just-restored skip prefix: re-saving with 0
                    # would double-train it on the next resume.
                    raise PreemptionInterrupt(epoch, self._skip_batches)
                tr = self.run_train_epoch(epoch)
                if (
                    self.ckpt is not None
                    and getattr(self, "_resumed_from_preempt", False)
                    and self.ckpt.has_preempt()
                ):
                    # Clear ONLY the marker this run consumed (a fresh fit()
                    # must not destroy another run's preempt state).
                    self.ckpt.clear_preempt()
                    self._resumed_from_preempt = False
            except PreemptionInterrupt as pi:
                if self.ckpt is not None:
                    self.ckpt.save_preempt(self.state, pi.epoch, pi.batches_done)
                    self.ckpt.wait()
                logger.warning(
                    f"Preempted in epoch {pi.epoch} after {pi.batches_done} batches — "
                    "state saved; rerun with --resume-from for an exact continuation"
                )
                return history
            va = self.run_eval_epoch("val") if len(self.dm.val_idx) else {}
            record = {
                "epoch": epoch,
                "train/lr": float(cfg.train.lr),  # LearningRateMonitor parity
                **{f"train/{k}": v for k, v in tr.items()},
                **{f"val/{k}": v for k, v in va.items()},
            }
            history.append(record)
            logger.info(
                f"mae epoch {epoch}: train loss {tr.get('loss', float('nan')):.4f} | "
                f"val loss {va.get('loss', float('nan')):.4f} | "
                f"{tr.get('images_per_sec', 0):.1f} img/s"
            )
            if self.run_logger is not None:
                self.run_logger.log_scalars(
                    {k: v for k, v in record.items() if k != "epoch"}, step=int(self.state.step)
                )
                self._log_reconstruction_image()
            if self.ckpt is not None and (epoch + 1) % cfg.train.ckpt_every_n_epochs == 0:
                self.ckpt.save_epoch(epoch, self.state, metrics=record)
        if self.ckpt is not None:
            self.ckpt.wait()
        return history

    def _log_reconstruction_image(self) -> None:
        """RGB original-vs-reconstruction pair (parity: reference
        train_mae_prithvi.py:169-203 wandb reconstruction logging)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        try:
            split = "val" if len(self.dm.val_idx) else "train"
            batch = next(iter(self.dm.eval_batches(split)))
            rec = self.reconstruct(batch.images[:1])[0, 0]  # (H, W, C) denormalized
            orig = np.asarray(batch.images[0], np.float64)
            if orig.ndim == 4:  # multi-temporal (T, H, W, C): show frame 0
                orig = orig[0]

            def to_rgb(img_hwc):
                rgb = img_hwc[..., [2, 1, 0]].astype(np.float64)  # B04,B03,B02
                lo, hi = np.percentile(rgb, [2, 98])
                return np.clip((rgb - lo) / max(hi - lo, 1e-9), 0, 1)

            fig, axes = plt.subplots(1, 2, figsize=(8, 4))
            axes[0].imshow(to_rgb(orig))
            axes[0].set_title("original")
            axes[1].imshow(to_rgb(rec))
            axes[1].set_title(f"reconstruction (mask {self.mask_ratio:.0%})")
            for ax in axes:
                ax.axis("off")
            fig.tight_layout()
            self.run_logger.log_image("val/reconstruction", fig, int(self.state.step))
            plt.close("all")
        except Exception as e:  # noqa: BLE001 — never kill training over a plot
            logger.warning(f"reconstruction logging failed: {e}")
