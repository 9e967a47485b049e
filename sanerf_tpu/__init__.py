"""sanerf_tpu — a TPU-native JAX framework for Segment-Anything NeRF.

A from-scratch rebuild of the capabilities of lyclyc52/Segment-Anything-NeRF
(instant-ngp-style NeRF distilling SAM ViT-H features for interactive 3D
segmentation), designed TPU-first:

- All compute paths are pure functions over param pytrees, jitted with XLA.
- The three CUDA extensions of the reference (gridencoder / shencoder /
  freqencoder) are replaced by a JAX hash-grid encoder with an optional
  fused Pallas kernel, and closed-form jnp SH / frequency encodings that XLA
  fuses into the surrounding MLPs.
- Fixed shapes everywhere: the mip-NeRF-360-style proposal sampler (128/64/32
  samples per level) is a dense, regular computation that maps directly onto
  the MXU/VPU with no ray compaction.
- Multi-chip scaling is first-class: a 1-D data-parallel mesh via
  `jax.sharding` + `shard_map` with ICI collectives (see sanerf_tpu.parallel).
"""

__version__ = "0.1.0"
