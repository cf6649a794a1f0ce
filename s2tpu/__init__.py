"""s2tpu — TPU-native Sentinel-2 land-cover framework.

A ground-up JAX/Flax/Pallas/pjit rebuild of the capabilities of
MaxWolf-01/sentinel2-landcover-classification (reference mounted at
/root/reference): Sentinel-2 L2A acquisition, OSM / CNES Land Cover label
taxonomies, EfficientNet-UNet (B0-B7) and Prithvi-100M ViT-MAE model
families, the full loss/schedule/metric zoo, data-parallel training over a
`jax.sharding.Mesh`, Orbax checkpointing, PyTorch weight conversion, and
tiled sliding-window inference.

Design notes (TPU-first, not a translation):
  * all convolutional models run NHWC / HWIO (XLA-TPU native layout);
  * compute path is bf16 with f32 accumulation on the MXU;
  * augmentation (crop/flip) happens on device inside the jit'd step,
    keyed by explicit `jax.random` keys;
  * parallelism is sharding annotations over a device mesh (dp/fsdp/tp),
    never explicit communication calls;
  * hot ops that XLA does not fuse well are Pallas kernels (s2tpu.ops).
"""

__version__ = "0.1.0"


def _honor_jax_platforms_env() -> None:
    """Re-apply an explicit ``JAX_PLATFORMS`` env request over any config
    override installed before us (the axon TPU-relay sitecustomize hard-sets
    ``jax_platforms='axon,cpu'`` in jax CONFIG, which silently wins over the
    env var — a CLI launched with ``JAX_PLATFORMS=cpu`` would otherwise run
    on the TPU). No-op when the env var is unset or backends already
    initialized."""
    import os

    if not os.environ.get("JAX_PLATFORMS"):
        return
    import jax

    try:
        from jax._src import xla_bridge  # private: guard against jax moving it

        initialized = xla_bridge.backends_are_initialized()
    except Exception:  # noqa: BLE001 — fall back to applying the override
        initialized = False
    if jax.config.jax_platforms != os.environ["JAX_PLATFORMS"] and not initialized:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


_honor_jax_platforms_env()
