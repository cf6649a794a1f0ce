"""AOT executable export/load: skip XLA compilation at serving cold-start.

The reference leans on torch.compile's on-disk inductor cache to hide
recompilation across runs (src/configs/segmentation.py:147-153 enables
``torch.compile(mode="max-autotune", fullgraph=True)``); the TPU-native
equivalent has two tiers:

1. the persistent XLA compile cache (enabled by bench/CLI entry points) —
   keyed by HLO hash, shared across processes on one host;
2. this module — an *explicit* serialized-executable artifact that can be
   shipped with a model checkpoint, so a serving replica's first request
   never compiles at all (deserialize is ~ms; a B5 tiled-inference compile
   through the remote relay is minutes).

The artifact embeds a fingerprint (jax version, backend, device kind and
count, the abstract signature of every dynamic argument, and a free-form
``statics`` string for the caller's static config). ``load_executable``
returns ``None`` on any mismatch or deserialization error — callers fall
back to normal ``jit`` and overwrite the stale artifact.
"""

from __future__ import annotations

import dataclasses
import logging
import pickle
import typing
from pathlib import Path

import jax

logger = logging.getLogger(__name__)

_FORMAT_VERSION = 1


def _device_fingerprint() -> dict:
    devs = jax.devices()
    return {
        "format": _FORMAT_VERSION,
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device_kind": devs[0].device_kind,
        "n_devices": len(devs),
    }


def _abstract_signature(args: tuple, kwargs: dict) -> str:
    """Stable string for the dynamic-argument pytree (shapes + dtypes)."""
    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
    parts = [str(treedef)]
    for leaf in leaves:
        aval = jax.api_util.shaped_abstractify(leaf)
        parts.append(f"{aval.dtype}{tuple(aval.shape)}")
    return "|".join(parts)


@dataclasses.dataclass
class AotArtifact:
    """A loaded executable plus the fingerprint it was saved under."""

    compiled: typing.Callable
    meta: dict

    def __call__(self, *args, **kwargs):
        return self.compiled(*args, **kwargs)


def export_jitted(
    path: str | Path,
    jitfn: typing.Callable,
    *args,
    statics: str = "",
    **kwargs,
) -> typing.Callable:
    """Lower+compile ``jitfn`` for ``args``/``kwargs`` and serialize to ``path``.

    Returns the compiled executable (also usable immediately). ``statics``
    should encode any static configuration not visible in the dynamic
    argument signature (tile size, class count, model name, ...) — it is
    matched exactly at load time.
    """
    from jax.experimental import serialize_executable as se

    compiled = jitfn.lower(*args, **kwargs).compile()
    payload, in_tree, out_tree = se.serialize(compiled)
    meta = _device_fingerprint()
    meta["signature"] = _abstract_signature(args, kwargs)
    meta["statics"] = statics
    # deserialize_and_load defaults execution_devices to ALL backend devices;
    # a single-device program loaded onto an 8-device client then demands
    # 8-way-sharded args — record the true assignment and replay it at load.
    meta["exec_device_ids"] = [d.id for d in compiled.runtime_executable().local_devices()]
    blob = pickle.dumps(
        {"meta": meta, "payload": payload, "in_tree": in_tree, "out_tree": out_tree},
        protocol=pickle.HIGHEST_PROTOCOL,
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(blob)
    tmp.replace(path)  # atomic: a concurrent loader never sees a torn file
    logger.info("AOT executable exported to %s (%.1f MB)", path, len(blob) / 2**20)
    return compiled


def load_executable(
    path: str | Path,
    *args,
    statics: str = "",
    **kwargs,
) -> AotArtifact | None:
    """Deserialize an executable if its fingerprint matches this process.

    ``args``/``kwargs`` are the dynamic arguments the caller is about to
    pass — their abstract signature must equal the exported one. Returns
    ``None`` (never raises) when the artifact is absent, torn, or was built
    for a different jax version / device / signature / statics.
    """
    from jax.experimental import serialize_executable as se

    path = Path(path)
    if not path.exists():
        return None
    try:
        blob = pickle.loads(path.read_bytes())
        meta = blob["meta"]
        want = _device_fingerprint()
        want["signature"] = _abstract_signature(args, kwargs)
        want["statics"] = statics
        mismatch = {k: (meta.get(k), v) for k, v in want.items() if meta.get(k) != v}
        if mismatch:
            logger.info("AOT artifact %s stale (%s) — recompiling", path, mismatch)
            return None
        by_id = {d.id: d for d in jax.devices()}
        exec_devices = [by_id[i] for i in meta["exec_device_ids"]]
        compiled = se.deserialize_and_load(
            blob["payload"], blob["in_tree"], blob["out_tree"], execution_devices=exec_devices
        )
        return AotArtifact(compiled=compiled, meta=meta)
    except Exception as exc:  # torn file, version skew inside XLA, ...
        logger.info("AOT artifact %s unusable (%s: %s) — recompiling", path, type(exc).__name__, exc)
        return None
