"""Cross-cutting helpers: logging, run names, prithvi config loading.

Parity: reference src/utils.py:22-111 (get_logger, run names, prithvi
config/mean-std loading). Weight loading itself lives in
s2tpu.checkpoint.convert_torch (the PyTorch->Flax conversion point).
"""

from __future__ import annotations

import logging
import random
import string
from datetime import datetime
from pathlib import Path

import yaml

from s2tpu.configs.paths import CONFIG_DIR, LOG_DIR

PRITHVI_CONFIG: Path = CONFIG_DIR / "prithvi_config.yaml"

_FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"


def get_logger(name: str, log_level: int = logging.INFO, to_file: bool = True) -> logging.Logger:
    """File+console logger with a per-run timestamped logfile under logs/system/."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(log_level)
    console = logging.StreamHandler()
    console.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(console)
    if to_file:
        try:
            log_dir = LOG_DIR / "system"
            log_dir.mkdir(parents=True, exist_ok=True)
            fh = logging.FileHandler(log_dir / f"{datetime.now():%Y-%m-%d_%H-%M-%S}.log")
            fh.setFormatter(logging.Formatter(_FORMAT))
            logger.addHandler(fh)
        except OSError:
            pass  # read-only filesystem: console-only
    return logger


def load_prithvi_model_args(num_frames: int | None = None) -> dict:
    with PRITHVI_CONFIG.open() as f:
        args = yaml.safe_load(f)["model_args"]
    if num_frames is not None:
        args["num_frames"] = num_frames
    return args


def load_prithvi_mean_std() -> tuple[list[float], list[float]]:
    with PRITHVI_CONFIG.open() as f:
        params = yaml.safe_load(f)["train_params"]
    return params["data_mean"], params["data_std"]


def get_unique_run_name(name: str | None = None, postfix: str | None = None) -> str:
    run = "".join(random.choices(string.ascii_uppercase + string.digits, k=6))
    if postfix is not None:
        run = f"{run}_{postfix}"
    if name is not None:
        run = f"{name}_{run}"
    return run
