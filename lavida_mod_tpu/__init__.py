"""lavida_mod_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal masked-diffusion
language-model framework with the capabilities of LaViDa (rkawamura0483/LaViDa_mod).

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

  ops/         pure compute kernels: schedules, sampling, attention (dense /
               blockwise online-softmax / pallas flash dispatch), rope, norms,
               pooling, int8 quant, Pallas row-gather
  models/      functional model cores (params pytrees): LLaDA, Dream, AR
               baselines, SigLIP, CLIP(+S2), projectors, resamplers, SHIRG,
               and the composed LaViDa multimodal model
  generation/  samplers: masked-diffusion denoise scans with prefix KV cache,
               Dream sampler, AR decode, MC log-likelihood, FIM drafts
  data/        host-side data & prompt layer: anyres geometry, image/video
               preprocessing (+native C++ extension), conversation templates,
               training datasets/mixtures/collator, FIM corruption
  parallel/    mesh construction + GSPMD sharding rules (replaces DeepSpeed ZeRO)
  train/       diffusion loss (complementary masking), multimodal pjit train
               step, LoRA, DPO, in-training eval hook
  eval/        evaluator + adapter + metrics + task registry (lmms-eval analogue)
  serve/       controller / worker / web UI / terminal chat
  utils/       checkpointing (orbax), logging, profiling
  tools/       weight delta/consolidation utilities
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401,E402
    DreamGenerationConfig,
    GenerationConfig,
    LaViDaConfig,
    LLaDAConfig,
    SigLIPConfig,
    VisionConfig,
)
