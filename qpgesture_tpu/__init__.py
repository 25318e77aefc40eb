"""qpgesture_tpu — a TPU-native speech-driven gesture generation framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
YoungSeng/QPGesture (CVPR 2023): a gesture VQ-VAE codebook, a DeepPhase-style
periodic autoencoder for phase guidance, and a quantization-based motion
matching engine that searches gestures instead of regressing them.

Layer map (mirrors the reference's six layers, reference paths in docstrings):

  core/       typed configs + exact npz artifact schemas
  motion/     BVH parsing/writing, skeleton pipelines, rotation math, jnp FK
  models/     flax VQ-VAE, PAE, GRU baseline, ResyncNet, WavLM, vq-wav2vec
  ops/        device kernels: Levenshtein DP, fused distance+segment-min,
              rank fusion, MFCC, feature stacking
  match/      the motion-matching engine (CodeKNN / GestureKNN equivalents)
              as single device programs
  train/      pjit data-parallel trainers + orbax checkpoints
  parallel/   mesh/sharding helpers, graceful single-device degradation
  pipelines/  database construction (BEAT steps 1-4 equivalents)
  render/     codes -> poses -> BVH -> video, metrics (Hellinger/FGD)
  utils/      profiling, logging
"""

__version__ = "0.1.0"
