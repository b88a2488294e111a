"""cape_tpu — a TPU-native framework for conditional generative modeling of
clothed 3D humans on fixed-topology meshes.

Re-designed from scratch for JAX/XLA/Pallas/pjit with the same capabilities as
the CAPE reference implementation (CVPR'20): a graph-convolutional mesh CVAE
with a mesh-patch discriminator, conditioned on SMPL body pose and clothing
type, plus the surrounding framework — mesh-pyramid precompute, data packing,
training/eval/demo loops, SMPL linear-blend-skinning, latent GMM sampling,
checkpointing, and data-parallel execution over a TPU device mesh.

Layout:
  core/      config dataclasses, pytree/param utilities, rng plumbing
  meshops/   mesh topology, Laplacians, QSlim decimation, pyramid builder
  ops/       TPU compute ops: ELL sparse apply, Chebyshev conv, pool, norm
  models/    CAPE generator/discriminator/condition nets, GMM latent prior
  train/     losses are in losses.py; optimizers, schedules, steps, loop, ckpt
  parallel/  device mesh + sharding (data parallelism as a first-class module)
  smpl/      pure-JAX SMPL LBS and Rodrigues conversions
  data/      dataset packer, loaders, split configs, synthetic data
  apps/      CLI entry points (train/test/demo)
  tools/     TF-checkpoint -> pytree converter, parity harness
"""

__version__ = "0.1.0"
