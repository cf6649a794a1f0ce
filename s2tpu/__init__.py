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
