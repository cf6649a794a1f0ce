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

from s2tpu.configs import segmentation as cfg_lib  # noqa: E402
from s2tpu.data.pipeline import Datamodule  # noqa: E402
from s2tpu.parallel import mesh as mesh_lib  # noqa: E402
from s2tpu.train.trainer import SegmentationTrainer  # noqa: E402

config = cfg_lib.base_config("efficientnet-unet-b0", aoi="small", label_map="osm-multiclass")
config.datamodule.dataset_cfg.data_dir = fixture_dir
config.datamodule.batch_size = 4 * n_proc  # global; 4 per process, 1 per device
config.datamodule.random_crop_size = 64
config.datamodule.data_split = (0.5, 0.5, 0.0)
config.train.compute_dtype = "float32"
config.train.max_epochs = 1
if mode == "corpus":
    config.train.device_corpus = True
    config.train.device_corpus_sharded = True

dm = Datamodule(config.datamodule)
assert dm.n_proc == n_proc and dm.proc == pid
mesh = mesh_lib.make_mesh(-1)  # all global devices
assert mesh.devices.size == 4 * n_proc

trainer = SegmentationTrainer(config, dm, mesh=mesh)
history = trainer.fit(epochs=1)
rec = history[0]
print(
    "RESULT "
    + json.dumps(
        {
            "pid": pid,
            "train_loss": rec.get("train/loss"),
            "val_loss": rec.get("val/loss"),
            "val_iou": rec.get("val/iou"),
        }
    ),
    flush=True,
)
