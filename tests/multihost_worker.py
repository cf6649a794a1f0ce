"""Worker process for the multi-process CPU multihost simulation tests.

Usage: python tests/multihost_worker.py <coordinator_port> <process_id>
           <fixture_dir> [n_processes] [mode]

Each process gets 4 virtual CPU devices (global mesh = n_processes x 4),
builds the same Datamodule with its own process slice, and runs one epoch
+ one eval pass of EfficientNet-UNet-B0 over the global ('data',) mesh.
mode "corpus" instead trains from a 'data'-sharded device corpus (each
host holds only its own HBM block; see s2tpu/data/device_corpus.py).
Prints one JSON line with the losses so the parent can assert all
processes agree (the model state is fully replicated, so they must).
"""

import json
import os
import sys

port, pid, fixture_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
n_proc = int(sys.argv[4]) if len(sys.argv) > 4 else 2
mode = sys.argv[5] if len(sys.argv) > 5 else "pipeline"

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from s2tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"localhost:{port}", num_processes=n_proc, process_id=pid)
assert jax.process_count() == n_proc, jax.process_count()
assert len(jax.local_devices()) == 4, jax.local_devices()
assert jax.device_count() == 4 * n_proc, jax.device_count()

import numpy as np  # noqa: E402

from s2tpu.parallel import mesh as mesh_lib  # noqa: E402

mesh = mesh_lib.make_mesh(-1)  # all global devices
assert mesh.devices.size == 4 * n_proc

if mode == "serve":
    # Multi-host tiled serving (TODO r3 #10): each process drives the REAL
    # inference CLI; the CLI slices the segment list per process
    # (multihost_segment_slice), serves its share on a process-LOCAL mesh
    # (no cross-host program), and writes segment-keyed files into the
    # shared out dir. Parent asserts union == single-process outputs.
    from pathlib import Path  # noqa: E402

    from s2tpu.cli.infer import main as infer_main  # noqa: E402

    ckpt_dir = os.environ["S2TPU_SERVE_CKPT"]
    out_dir = os.environ["S2TPU_SERVE_OUT"]
    infer_main([
        ckpt_dir, "--tiled", "--out", out_dir, "--data-dir", fixture_dir, "--split", "val",
    ])
    # batch-logits mode too: each process predicts its eval-batch slice and
    # writes under its own p<pid>_ prefix (no filename collisions).
    infer_main([ckpt_dir, "--out", out_dir, "--data-dir", fixture_dir, "--split", "val"])
    files = sorted(p.name for p in Path(out_dir).glob("pred_*.tif"))
    result = {"pid": pid, "train_loss": 0.0, "val_loss": 0.0, "val_iou": 0.0, "files": files}
elif mode == "mae_corpus":
    # MAE pretraining from a 'data'-sharded unlabeled device corpus
    # (per-host HBM blocks; VERDICT r2 item #4b).
    from s2tpu.configs import mae as mae_cfg  # noqa: E402
    from s2tpu.configs.segmentation import DatamoduleConfig, DatasetConfig  # noqa: E402
    from s2tpu.data.dataset import TiffSource  # noqa: E402
    from s2tpu.data.pipeline import Datamodule  # noqa: E402
    from s2tpu.models.prithvi_mae import PrithviConfig  # noqa: E402
    from s2tpu.train.mae_trainer import MAETrainer  # noqa: E402

    tiny = PrithviConfig(
        img_size=32, patch_size=16, num_frames=1, tubelet_size=1, in_chans=6,
        embed_dim=32, depth=1, num_heads=2, decoder_embed_dim=16,
        decoder_depth=1, decoder_num_heads=2,
    )
    c = mae_cfg.base_config(aoi="small")
    c.datamodule.dataset_cfg.data_dir = fixture_dir
    c.datamodule.batch_size = 4 * n_proc
    c.datamodule.random_crop_size = 32
    c.datamodule.data_split = (0.5, 0.5, 0.0)
    c.train.from_scratch = True
    c.train.device_corpus = True
    c.train.device_corpus_sharded = True
    source = TiffSource("small", "osm-multiclass", data_dir=fixture_dir, require_labels=False)
    dm = Datamodule(
        DatamoduleConfig(
            dataset_cfg=DatasetConfig(aoi="small", label_map="osm-multiclass", data_dir=fixture_dir),
            batch_size=4 * n_proc,
            data_split=(0.5, 0.5, 0.0),
            random_crop_size=32,
        ),
        source=source,
    )
    assert dm.n_proc == n_proc and dm.proc == pid
    trainer = MAETrainer(c, dm, mesh=mesh, model_config=tiny)
    assert trainer.corpus is not None and trainer.corpus.sharded
    history = trainer.fit(epochs=1)
    rec = history[0]
    result = {
        "pid": pid,
        "train_loss": rec.get("train/loss"),
        "val_loss": rec.get("val/loss"),
        "val_iou": 0.0,
    }
elif mode == "preempt":
    # Multi-host preemption: SIGTERM lands on ONE host only; the per-step
    # flag all-gather (preempt_requested) makes every process stop at the
    # SAME batch, all processes cooperate in the Orbax preempt save, and a
    # second multi-host run resumes mid-epoch to a state identical to an
    # uninterrupted run. Phases (S2TPU_PREEMPT_PHASE): ref | interrupt |
    # resume.
    import signal  # noqa: E402

    from s2tpu.checkpoint.orbax_io import CheckpointManager  # noqa: E402
    from s2tpu.configs import segmentation as cfg_lib  # noqa: E402
    from s2tpu.data.pipeline import Datamodule  # noqa: E402
    from s2tpu.train.trainer import SegmentationTrainer  # noqa: E402

    phase = os.environ["S2TPU_PREEMPT_PHASE"]
    config = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    config.datamodule.dataset_cfg.data_dir = fixture_dir
    config.datamodule.batch_size = 4 * n_proc
    config.datamodule.random_crop_size = 64
    config.datamodule.data_split = (1.0, 0.0, 0.0)
    config.train.compute_dtype = "float32"
    dm = Datamodule(config.datamodule)
    mgr = CheckpointManager(os.environ["S2TPU_PREEMPT_CKPT"]) if phase != "ref" else None
    trainer = SegmentationTrainer(config, dm, mesh=mesh, checkpoint_manager=mgr)
    start, skip_at_resume = 0, 0
    if phase == "interrupt":
        orig = trainer.train_step
        calls = {"n": 0}

        def wrapped(*a, **kw):
            out = orig(*a, **kw)
            calls["n"] += 1
            if calls["n"] == 1 and pid == 0:  # only host 0 is preempted
                signal.raise_signal(signal.SIGTERM)
            return out

        trainer.train_step = wrapped
    elif phase == "resume":
        start = trainer.resume_from_checkpoint()
        skip_at_resume = trainer._skip_batches
    history = trainer.fit(epochs=1, start_epoch=start)
    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    result = {
        "pid": pid,
        "phase": phase,
        "step": int(trainer.state.step),
        "start_epoch": start,
        "skip_at_resume": skip_at_resume,
        "epochs_completed": len(history),
        "has_preempt": bool(mgr.has_preempt()) if mgr is not None else False,
        "param_fingerprint": float(sum(np.float64(np.asarray(x)).sum() for x in leaves)),
    }
else:
    from s2tpu.configs import segmentation as cfg_lib  # noqa: E402
    from s2tpu.data.pipeline import Datamodule  # noqa: E402
    from s2tpu.train.trainer import SegmentationTrainer  # noqa: E402

    config = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
    config.datamodule.dataset_cfg.data_dir = fixture_dir
    config.datamodule.batch_size = 4 * n_proc  # global; 4 per process, 1 per device
    config.datamodule.random_crop_size = 64
    config.datamodule.data_split = (0.5, 0.5, 0.0)
    config.train.compute_dtype = "float32"
    config.train.max_epochs = 1
    if mode in ("corpus", "bnrecal_corpus"):
        config.train.device_corpus = True
        config.train.device_corpus_sharded = True
    if mode in ("bnrecal_corpus", "bnrecal_stream"):
        # Multi-host BN recalibration: exact pooled statistics over GLOBAL
        # batches before the val pass (VERDICT r2 item #4a — was skipped
        # under process_count > 1 in r2).
        config.train.bn_recalibration_batches = 2

    dm = Datamodule(config.datamodule)
    assert dm.n_proc == n_proc and dm.proc == pid

    # S2TPU_IMG_LOG: attach a RunLogger so the epoch image path runs —
    # process 0 must render overlays via its process-LOCAL predict, the
    # others must skip (no SPMD deadlock, no duplicate files).
    img_log = os.environ.get("S2TPU_IMG_LOG")
    run_logger = None
    if img_log:
        from pathlib import Path  # noqa: E402

        from s2tpu.train.logging_utils import RunLogger  # noqa: E402

        run_logger = RunLogger(
            run_name=f"img_p{pid}", log_dir=Path(img_log), project="mh-test",
            entity=None, tags=[], config={}, use_wandb=False,
        )

    trainer = SegmentationTrainer(config, dm, mesh=mesh, run_logger=run_logger)
    history = trainer.fit(epochs=1)
    rec = history[0]
    result = {
        "pid": pid,
        "train_loss": rec.get("train/loss"),
        "val_loss": rec.get("val/loss"),
        "val_iou": rec.get("val/iou"),
    }
    if img_log:
        from pathlib import Path  # noqa: E402

        result["n_images"] = len(list((Path(img_log) / f"img_p{pid}").glob("*.png")))
        run_logger.finish()
    if mode in ("bnrecal_corpus", "bnrecal_stream"):
        # Fingerprint the pooled BN statistics: all processes must hold the
        # exact same recalibrated stats (replicated).
        leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.state.batch_stats))
        result["bn_fingerprint"] = float(sum(np.float64(np.asarray(x)).sum() for x in leaves))

print("RESULT " + json.dumps(result), flush=True)
