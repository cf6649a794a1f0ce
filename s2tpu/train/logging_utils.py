"""Run logging: console + JSONL metrics + optional wandb (gated).

The reference logs scalars/images to wandb and files via Lightning
(SURVEY.md §5 observability). wandb is optional here: when the package is
missing or disabled, everything still lands in a per-run JSONL file and the
console logger, so runs are observable offline.
"""

from __future__ import annotations

import json
import time
import typing
from pathlib import Path

from s2tpu.utils import get_logger

logger = get_logger(__name__)

try:
    import wandb as _wandb

    _WANDB_AVAILABLE = True
except ImportError:
    _wandb = None
    _WANDB_AVAILABLE = False


class RunLogger:
    def __init__(
        self,
        run_name: str,
        log_dir: str | Path,
        project: str = "s2tpu",
        entity: str | None = None,
        tags: typing.Sequence[str] = (),
        config: dict | None = None,
        use_wandb: bool = False,
    ) -> None:
        self.run_name = run_name
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl_path = self.log_dir / f"{run_name}.metrics.jsonl"
        self._wandb_run = None
        if use_wandb and _WANDB_AVAILABLE:
            self._wandb_run = _wandb.init(
                project=project, entity=entity, name=run_name, tags=list(tags), config=config
            )
        elif use_wandb:
            logger.warning("wandb requested but not installed — falling back to JSONL logging")
        if config is not None:
            (self.log_dir / f"{run_name}.config.json").write_text(json.dumps(config, default=str, indent=2))

    def log_scalars(self, scalars: dict[str, float], step: int) -> None:
        record = {"step": step, "time": time.time(), **{k: float(v) for k, v in scalars.items()}}
        with self.jsonl_path.open("a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb_run is not None:
            self._wandb_run.log(scalars, step=step)

    def log_image(self, name: str, image, step: int) -> None:
        """Save a figure/array under out/<run>/ and mirror to wandb."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        img_dir = self.log_dir / self.run_name
        img_dir.mkdir(parents=True, exist_ok=True)
        path = img_dir / f"{name.replace('/', '_')}_{step}.png"
        if hasattr(image, "savefig"):
            image.savefig(path, bbox_inches="tight")
            plt.close(image)
        else:
            plt.imsave(path, image)
        if self._wandb_run is not None:
            self._wandb_run.log({name: _wandb.Image(str(path))}, step=step)

    def finish(self) -> None:
        if self._wandb_run is not None:
            self._wandb_run.finish()
