"""raggesture_tpu — TPU-native (JAX/XLA/Pallas) retrieval-augmented co-speech
gesture synthesis framework.

A ground-up rebuild of the capabilities of RAG-Gesture (CVPR 2025,
``m-hamza-mughal/RAG-Gesture``): a latent diffusion model over a 4-body-part
Transformer-VAE latent space, conditioned on audio/text/speaker, with exemplar
retrieval injected through DDIM inversion and gradient-based insertion
guidance.  Everything on the compute path is pure-functional JAX: schedule
tables are precomputed, sampling loops are ``lax.scan``, parallelism is a
``jax.sharding.Mesh``.

Package layout:
  ops/        pure math: rotation conversions, linear attention (XLA + Pallas)
  models/     Flax modules: body-part VAEs, gesture codec, denoiser, FGD embedder
  diffusion/  schedule tables, Gaussian diffusion math, scan-based samplers
  retrieval/  exemplar retrieval: discourse / gesture-type / LLM scorers + database
  datasets/   BEAT2 featurization, window sampling, shard cache, synthetic fixtures
  train/      optax train step, data-parallel mesh, orbax checkpointing
  eval/       FGD / BeatAlign / L1Div / SRGR / MPJPE / diversity metrics
  parallel/   mesh + sharding helpers
  utils/      config system, logging, torch->jax checkpoint conversion
"""

__version__ = "0.1.0"
