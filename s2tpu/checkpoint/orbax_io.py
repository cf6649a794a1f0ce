"""Checkpointing via Orbax: async sharded saves, best+last retention.

Parity with the reference's ModelCheckpoint policy (train_segmentation.py:
247-255: monitor val/loss, save_top_k=1, save_last, every epoch) plus the
hyperparameter embedding that makes ``load_from_checkpoint`` self-contained
(train_segmentation.py:47). TPU-native: saves are asynchronous (training
continues while the previous state serializes) and arrays are written with
their shardings, so multi-host restore places shards directly.
"""

from __future__ import annotations

import json
import typing
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from s2tpu.train.train_state import TrainState


class CheckpointManager:
    """Epoch checkpoints with best-val-loss retention + always-keep-last."""

    def __init__(
        self,
        directory: str | Path,
        keep: int = 1,
        monitor: str = "val/loss",
        mode: str = "min",
        config_dict: dict | None = None,
    ) -> None:
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        sign = 1.0 if mode == "min" else -1.0

        def best_fn(metrics: dict) -> float:
            return -sign * metrics.get(monitor, sign * float("inf"))

        self._manager = ocp.CheckpointManager(
            self.directory.resolve(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                best_fn=best_fn,
                best_mode="max",
                keep_period=None,
                enable_async_checkpointing=True,
            ),
        )
        if config_dict is not None:
            (self.directory / "config.json").write_text(json.dumps(config_dict, default=str, indent=2))

    def save_epoch(self, epoch: int, state: TrainState, metrics: dict | None = None) -> None:
        metrics = {k: float(v) for k, v in (metrics or {}).items() if np.isscalar(v)}
        self._manager.save(
            epoch, args=ocp.args.StandardSave(_to_saveable(state)), metrics=metrics
        )

    def wait(self) -> None:
        self._manager.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self._manager.latest_step()

    def best_epoch(self) -> int | None:
        return self._manager.best_step()

    def restore(self, state_like: TrainState, epoch: int | None = None) -> TrainState:
        """Restore into the structure/shardings of ``state_like``."""
        if epoch is None:
            epoch = self._manager.latest_step()
        assert epoch is not None, "no checkpoint to restore"
        restored = self._manager.restore(
            epoch, args=ocp.args.StandardRestore(_to_saveable(state_like))
        )
        return TrainState(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored.get("batch_stats", {}),
            opt_state=jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(state_like.opt_state),
                jax.tree_util.tree_leaves(restored["opt_state"]),
            ),
        )

    def load_config(self) -> dict | None:
        path = self.directory / "config.json"
        return json.loads(path.read_text()) if path.exists() else None

    # -- preemption saves ------------------------------------------------
    # TPU pods receive SIGTERM on spot preemption / maintenance events. A
    # preempt save is a synchronous (we are about to be killed) full-state
    # save OUTSIDE the epoch-keyed manager, plus a marker recording how far
    # into the epoch training got; resume replays the interrupted epoch's
    # deterministic draw stream, skipping the completed batches — an exact
    # continuation. The reference has no equivalent (Lightning restarts at
    # the last epoch boundary).

    @property
    def _preempt_dir(self) -> Path:
        return self.directory / "preempt"

    def save_preempt(self, state: TrainState, epoch: int, batches_done: int) -> None:
        """Multi-host: ALL processes call this with the same (epoch,
        batches_done) — preempt_requested() guarantees agreement on the
        stopping batch; Orbax coordinates the sharded write, process 0 owns
        the filesystem mutations around it."""
        multi = jax.process_count() > 1
        path = self._preempt_dir.resolve()
        if jax.process_index() == 0 and path.exists():
            import shutil

            shutil.rmtree(path)
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("s2tpu_preempt_pre_save")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path / "state", _to_saveable(state))
        ckptr.wait_until_finished()
        ckptr.close()
        if jax.process_index() == 0:
            (self.directory / "preempt.json").write_text(
                json.dumps({"epoch": epoch, "batches_done": batches_done})
            )
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("s2tpu_preempt_post_save")

    def has_preempt(self) -> bool:
        return (self.directory / "preempt.json").exists()

    def preempt_epoch(self) -> int:
        """Epoch of the pending preemption save (marker only, no restore) —
        lets the trainer match opt_state structure (e.g. the unfreeze
        transition) BEFORE building the restore template."""
        return int(json.loads((self.directory / "preempt.json").read_text())["epoch"])

    def restore_preempt(self, state_like: TrainState) -> tuple[TrainState, int, int]:
        """(state, epoch, batches_done) of the interrupted epoch."""
        marker = json.loads((self.directory / "preempt.json").read_text())
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            self._preempt_dir.resolve() / "state", target=_to_saveable(state_like)
        )
        ckptr.close()
        state = TrainState(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored.get("batch_stats", {}),
            opt_state=jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(state_like.opt_state),
                jax.tree_util.tree_leaves(restored["opt_state"]),
            ),
        )
        return state, int(marker["epoch"]), int(marker["batches_done"])

    def clear_preempt(self) -> None:
        # Process 0 owns the deletion; others no-op (no barrier — a stale
        # marker between the unlink and another process's next has_preempt()
        # poll is harmless, the interrupted epoch has already completed).
        if jax.process_index() != 0:
            return
        import shutil

        (self.directory / "preempt.json").unlink(missing_ok=True)
        if self._preempt_dir.exists():
            shutil.rmtree(self._preempt_dir)

    def restore_raw(self, epoch: int | None = None) -> dict:
        """Restore the saved tree without a template (raw arrays) — for
        cross-model ingestion, e.g. loading an s2tpu MAE pretraining
        checkpoint's encoder into the segmentation backbone."""
        if epoch is None:
            epoch = self._manager.latest_step()
        assert epoch is not None, "no checkpoint to restore"
        # A garbage-collected step makes Orbax raise a misleading
        # "Composite args" error — fail with the real cause instead.
        steps = list(self._manager.all_steps())
        assert epoch in steps, (
            f"epoch {epoch} not present in {self.directory} (available: {steps}); "
            "older epochs are retained per ckpt_keep / best-val policy"
        )
        return self._manager.restore(epoch, args=ocp.args.StandardRestore())

    def close(self) -> None:
        self._manager.close()


def load_params(directory: str | Path, epoch: int | None = None) -> dict:
    """Params pytree from any s2tpu checkpoint directory (no templates)."""
    mgr = CheckpointManager(directory)
    try:
        return mgr.restore_raw(epoch)["params"]
    finally:
        mgr.close()


def _to_saveable(state: TrainState) -> dict[str, typing.Any]:
    """Flatten opt_state to leaves (optax states contain non-serializable
    NamedTuples across versions; leaves + treedef-from-template restore them)."""
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": jax.tree_util.tree_leaves(state.opt_state),
    }
