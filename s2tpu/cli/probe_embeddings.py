"""Linear-probe evaluation of exported MAE embeddings.

The standard downstream quality check for a self-supervised pretrain (the
MAE recipe's "linear probing"; the reference's only downstream evaluation is
the full segmentation finetune): fit a multinomial logistic regression from
per-segment embeddings (cli/export_embeddings.py) to per-segment majority
labels, and report probe accuracy against the majority-class baseline.

    python -m s2tpu.cli.probe_embeddings out/<run>_embeddings.npz \
        [--data-dir D] [--steps 300] [--split 0.8]

The probe is one jit'd full-batch Adam loop (the embedding matrix is tiny —
N segments x 768); labels come from each segment's label raster (majority
class, masked class 0 excluded when present). Prints one JSON line with
train/eval accuracy and the baseline.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from s2tpu.utils import get_logger

logger = get_logger(__name__)


def majority_label(raster: np.ndarray, ignore_zero: bool = True) -> int:
    """Per-segment target: the most frequent class (class 0 = unlabeled is
    excluded unless the raster is entirely unlabeled)."""
    counts = np.bincount(raster.reshape(-1).astype(np.int64))
    if ignore_zero and counts.size > 1 and counts[1:].sum() > 0:
        return int(counts[1:].argmax()) + 1
    return int(counts.argmax())


def fit_probe(
    x_train: np.ndarray,
    y_train: np.ndarray,
    num_classes: int,
    steps: int = 300,
    lr: float = 1e-2,
    weight_decay: float = 1e-4,
    seed: int = 0,
):
    """Full-batch multinomial logistic regression; returns predict(x)->labels."""
    import jax
    import jax.numpy as jnp
    import optax

    x = jnp.asarray(x_train, jnp.float32)
    mu, sd = x.mean(axis=0), x.std(axis=0) + 1e-6
    x = (x - mu) / sd
    y = jnp.asarray(y_train, jnp.int32)
    d = x.shape[1]
    params = {
        "w": 0.01 * jax.random.normal(jax.random.key(seed), (d, num_classes), jnp.float32),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = x @ p["w"] + p["b"]
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(logp, y[:, None], axis=1).mean()

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    loss = None
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)

    def predict(feats: np.ndarray) -> np.ndarray:
        z = (jnp.asarray(feats, jnp.float32) - mu) / sd
        return np.asarray(jnp.argmax(z @ params["w"] + params["b"], axis=-1))

    return predict, float(loss)


def main(argv: list[str] | None = None) -> None:
    from s2tpu.configs.data_config import LABEL_MAPS

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("embeddings", help=".npz from cli/export_embeddings (pool=mean or cls)")
    p.add_argument("--aoi", default=None, help="override the AOI recorded in the npz meta")
    p.add_argument("--label-map", default="osm-multiclass", choices=sorted(LABEL_MAPS))
    p.add_argument("--data-dir", default=None)
    p.add_argument("--split", type=float, default=0.8, help="train fraction (seeded shuffle)")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    z = np.load(args.embeddings)
    feats = np.asarray(z["embeddings"], np.float32)
    assert feats.ndim == 2, (
        f"probe needs pooled embeddings (N, D); got {feats.shape} — export with "
        "--pool mean or --pool cls"
    )
    seg_ids = [str(s) for s in z["segment_ids"]]
    meta = json.loads(str(z["meta"]))
    aoi = args.aoi or meta["aoi"]

    from s2tpu.configs.data_config import DataDirs
    from s2tpu.geo.tiff import read_geotiff

    label_map = LABEL_MAPS[args.label_map]
    lut = label_map.remap_lut()  # None = identity (OSM maps)
    dirs = DataDirs(aoi=aoi, map_type=args.label_map, data_dir=args.data_dir)
    label_files = dirs.label_files

    xs, ys = [], []
    for sid, f in zip(seg_ids, feats):
        seg = int(sid.split("_")[0])
        if seg not in label_files:
            continue
        raster, _ = read_geotiff(label_files[seg])
        remapped = lut[raster[0]] if lut is not None else raster[0]
        xs.append(f)
        ys.append(majority_label(remapped))
    assert len(ys) >= 4, f"only {len(ys)} labeled segments under {dirs.label}"
    x, y = np.stack(xs), np.asarray(ys, np.int64)
    num_classes = int(label_map.num_classes)

    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(len(y))
    n_train = max(int(args.split * len(y)), 1)
    tr, ev = perm[:n_train], perm[n_train:]
    if len(ev) == 0:  # tiny corpora: report train-set accuracy only
        ev = tr

    predict, final_loss = fit_probe(
        x[tr], y[tr], num_classes, steps=args.steps, lr=args.lr, seed=args.seed
    )
    train_acc = float((predict(x[tr]) == y[tr]).mean())
    eval_acc = float((predict(x[ev]) == y[ev]).mean())
    counts = np.bincount(y[tr], minlength=num_classes)
    baseline = float((y[ev] == counts.argmax()).mean())
    record = {
        "n_segments": int(len(y)),
        "n_train": int(len(tr)),
        "n_eval": int(len(ev)),
        "num_classes": num_classes,
        "train_acc": round(train_acc, 4),
        "eval_acc": round(eval_acc, 4),
        "majority_baseline": round(baseline, 4),
        "final_loss": round(final_loss, 5),
        "embeddings": str(Path(args.embeddings)),
        "int8": meta.get("int8", False),
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
