"""lavida_mod_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal masked-diffusion
language-model framework with the capabilities of LaViDa (rkawamura0483/LaViDa_mod).

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

  ops/         pure compute kernels: schedules, sampling, attention, rope, norms,
               pooling, top-k gather (Pallas where hot)
  models/      functional model cores (params pytrees): LLaDA, Dream, SigLIP,
               projectors, and the composed LaViDa multimodal model
  generation/  masked-diffusion samplers (jitted denoise scans, prefix KV cache),
               Monte-Carlo log-likelihood, FIM draft injection
  data/        host-side data & prompt layer: anyres geometry, image preprocessing,
               conversation templates, training data pipeline
  parallel/    mesh construction + GSPMD sharding rules (replaces DeepSpeed ZeRO)
  train/       diffusion loss with complementary masking, pjit train step
  utils/       checkpointing (orbax), logging, profiling
"""

__version__ = "0.1.0"
