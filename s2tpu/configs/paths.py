"""On-disk layout registry — single source of truth for all paths.

Capability parity with reference src/configs/paths.py:3-11 (ROOT/DATA/CKPT/
LOG/OUT/weights/config dirs). Root is overridable via ``S2TPU_ROOT`` so tests
and multi-host runs can relocate all artifacts at once.
"""

from __future__ import annotations

import os
from pathlib import Path

ROOT_DIR: Path = Path(os.environ.get("S2TPU_ROOT", Path(__file__).resolve().parents[2]))
DATA_DIR: Path = ROOT_DIR / "data"
CKPT_DIR: Path = ROOT_DIR / "ckpts"
LOG_DIR: Path = ROOT_DIR / "logs"
OUT_DIR: Path = ROOT_DIR / "out"
PRE_TRAINED_WEIGHTS_DIR: Path = ROOT_DIR / "weights"
CONFIG_DIR: Path = Path(__file__).resolve().parent


def refresh_from_env() -> None:
    """Re-derive all paths from the current ``S2TPU_ROOT`` (used by tests)."""
    global ROOT_DIR, DATA_DIR, CKPT_DIR, LOG_DIR, OUT_DIR, PRE_TRAINED_WEIGHTS_DIR
    ROOT_DIR = Path(os.environ.get("S2TPU_ROOT", Path(__file__).resolve().parents[2]))
    DATA_DIR = ROOT_DIR / "data"
    CKPT_DIR = ROOT_DIR / "ckpts"
    LOG_DIR = ROOT_DIR / "logs"
    OUT_DIR = ROOT_DIR / "out"
    PRE_TRAINED_WEIGHTS_DIR = ROOT_DIR / "weights"
