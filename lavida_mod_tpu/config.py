"""Typed configuration tree.

The reference scatters configuration across three layers (HF dataclass args,
PretrainedConfig subclasses, and env-var feature flags — SURVEY.md §5).  Here
everything is a frozen dataclass so configs are hashable and can be closed over
by jitted functions as static arguments.

LLaDA field semantics follow reference
llava/model/language_model/llada/configuration_llada.py:130-384 (ModelConfig);
SigLIP follows llava/model/multimodal_encoder/siglip_base.py:74-106;
vision/composition knobs follow the stage-2 train script
scripts/train/exps/cluster/llada-hd-llada-s2.sh and llava/train/train.py arg
defaults (mm_spatial_pool_mode default "bilinear", train.py:93).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class LLaDAConfig:
    """Bidirectional (non-causal) diffusion-LM transformer config.

    Defaults are the LLaDA-8B geometry used by LaViDa (OLMo-style model with
    llama-block layout: separate q/k/v projections, SwiGLU via ff_proj/up_proj,
    RMSNorm, RoPE).
    """

    d_model: int = 4096
    n_heads: int = 32
    n_kv_heads: Optional[int] = None          # None => n_heads (MHA)
    n_layers: int = 32
    mlp_hidden_size: Optional[int] = 12288    # None => mlp_ratio * d_model
    mlp_ratio: int = 4
    # "llama" block: silu(ff_proj(x)) * up_proj(x); "sequential": fused att_proj
    # and swiglu over a single chunked ff_proj (modeling_llada.py:809-999).
    block_type: str = "llama"
    activation: str = "silu"                  # gelu|relu|silu|swiglu
    rope: bool = True
    rope_theta: float = 500000.0
    rope_full_precision: bool = True          # modeling_llada.py:436-437
    layer_norm_type: str = "rms"              # rms|default|gemma_rms
    rms_norm_eps: float = 1e-5
    layer_norm_eps: float = 1e-5
    attention_layer_norm: bool = False        # q/k norms
    layer_norm_with_affine: bool = True
    attention_layer_norm_with_affine: bool = True
    include_bias: bool = False
    include_qkv_bias: bool = False
    input_emb_norm: bool = False
    scale_logits: bool = False
    vocab_size: int = 126464
    embedding_size: Optional[int] = 126464    # padded-up embedding rows
    weight_tying: bool = False
    max_sequence_length: int = 4096
    mask_token_id: int = 126336
    eos_token_id: int = 126081
    pad_token_id: int = 126081

    @property
    def effective_n_kv_heads(self) -> int:
        return self.n_kv_heads if self.n_kv_heads is not None else self.n_heads

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def hidden_size(self) -> int:
        return (
            self.mlp_hidden_size
            if self.mlp_hidden_size is not None
            else self.mlp_ratio * self.d_model
        )

    @property
    def num_embeddings(self) -> int:
        return self.embedding_size or self.vocab_size

    def replace(self, **kw) -> "LLaDAConfig":
        return dataclasses.replace(self, **kw)


def tiny_llada_config(**kw) -> LLaDAConfig:
    """2-layer tiny fixture, the formalized analogue of the reference's
    `--dev test3` smoke harness (train.py:1780-1795)."""
    base = dict(
        d_model=64,
        n_heads=4,
        n_kv_heads=2,
        n_layers=2,
        mlp_hidden_size=128,
        vocab_size=512,
        embedding_size=512,
        rope_theta=10000.0,
        max_sequence_length=512,
        mask_token_id=500,
        eos_token_id=501,
        pad_token_id=501,
    )
    base.update(kw)
    return LLaDAConfig(**base)


@dataclass(frozen=True)
class SigLIPConfig:
    """SigLIP ViT config (siglip_base.py:74-106). No CLS token.

    `n_layers_used` reflects the tower's deletion of the final encoder layer
    (siglip_encoder.py:240): features are taken after layer `n_layers - 1`,
    i.e. full-model layer -2, with no post-layernorm.
    """

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_channels: int = 3
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"
    image_mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    image_std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    # Layers actually run by the vision tower (last deleted).
    drop_last_layer: bool = True

    @property
    def n_layers_used(self) -> int:
        return self.num_hidden_layers - (1 if self.drop_last_layer else 0)

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side**2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def replace(self, **kw) -> "SigLIPConfig":
        return dataclasses.replace(self, **kw)


def tiny_siglip_config(**kw) -> SigLIPConfig:
    base = dict(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
    )
    base.update(kw)
    return SigLIPConfig(**base)


# LaViDa-HD anyres grid pinpoints (llada-hd-llada-s2.sh --image_grid_pinpoints).
DEFAULT_GRID_PINPOINTS: Tuple[Tuple[int, int], ...] = (
    (384, 768),
    (768, 384),
    (768, 768),
    (1152, 384),
    (384, 1152),
)


@dataclass(frozen=True)
class VisionConfig:
    """Multimodal composition knobs (llava_arch + mm_utils behavior)."""

    siglip: SigLIPConfig = SigLIPConfig()
    projector_type: str = "mlp2x_gelu"        # builder.py:32-67
    mm_hidden_size: int = 1152
    # 2x2 token pooling applied per view (llava_arch.py:198-233).
    spatial_pool_mode: str = "bilinear"       # average|max|bilinear
    spatial_pool_stride: int = 2
    # "anyres" HD tiling (image_aspect_ratio) or "square" lowres single view.
    image_aspect_ratio: str = "anyres"
    grid_pinpoints: Tuple[Tuple[int, int], ...] = DEFAULT_GRID_PINPOINTS
    mm_patch_merge_type: str = "spatial_unpad"
    mm_newline_position: str = "one_token"

    def replace(self, **kw) -> "VisionConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class LaViDaConfig:
    """The composed multimodal model."""

    llada: LLaDAConfig = LLaDAConfig()
    vision: VisionConfig = VisionConfig()
    tokenizer_model_max_length: Optional[int] = None
    # training-time sequence hard cutoff (llava_llada.py:195-203)
    train_seq_cutoff: int = 30720

    def replace(self, **kw) -> "LaViDaConfig":
        return dataclasses.replace(self, **kw)


def _sniff_llada(cj: dict) -> LLaDAConfig:
    """Flat OLMo-style fields (configuration_llada.py:130-384 ModelConfig,
    serialized flat by the HF LLaDAConfig wrapper :398-414)."""
    kw = {}
    for f in (
        "d_model", "n_heads", "n_kv_heads", "n_layers", "mlp_hidden_size",
        "mlp_ratio", "rope", "rope_theta", "rope_full_precision",
        "rms_norm_eps", "attention_layer_norm", "layer_norm_with_affine",
        "attention_layer_norm_with_affine", "include_bias",
        "include_qkv_bias", "input_emb_norm", "scale_logits", "vocab_size",
        "embedding_size", "weight_tying", "max_sequence_length",
        "mask_token_id", "eos_token_id", "pad_token_id",
    ):
        if cj.get(f) is not None:
            kw[f] = cj[f]
    if cj.get("activation_type") in ("gelu", "relu", "silu", "swiglu"):
        kw["activation"] = cj["activation_type"]
    if cj.get("block_type") in ("llama", "sequential"):
        kw["block_type"] = cj["block_type"]
    lnt = cj.get("layer_norm_type")
    if isinstance(lnt, str):
        kw["layer_norm_type"] = ("gemma_rms" if "gemma" in lnt
                                 else "rms" if "rms" in lnt else "default")
    return LLaDAConfig(**kw)


def _sniff_dream(cj: dict) -> LLaDAConfig:
    """Qwen2-style fields (dream/configuration_dream.py:28-86)."""
    from .models.dream import dream_7b_config  # deferred: dream imports us

    kw = {}
    for src, dst in (
        ("hidden_size", "d_model"), ("num_attention_heads", "n_heads"),
        ("num_key_value_heads", "n_kv_heads"),
        ("num_hidden_layers", "n_layers"),
        ("intermediate_size", "mlp_hidden_size"),
        ("rope_theta", "rope_theta"), ("rms_norm_eps", "rms_norm_eps"),
        ("vocab_size", "vocab_size"),
        ("max_position_embeddings", "max_sequence_length"),
        ("tie_word_embeddings", "weight_tying"),
        ("mask_token_id", "mask_token_id"),
        ("eos_token_id", "eos_token_id"), ("pad_token_id", "pad_token_id"),
    ):
        if cj.get(src) is not None:
            kw[dst] = cj[src]
    if "vocab_size" in kw:
        kw.setdefault("embedding_size", kw["vocab_size"])
    return dream_7b_config(**kw)


def _sniff_vision(cj: dict) -> VisionConfig:
    """LLaVA composition fields the trainer writes onto the composed HF
    config (llava_arch.py:42-110: mm_vision_tower, mm_projector_type,
    mm_hidden_size, mm_patch_merge_type, ...; train.py mm_spatial_pool_*
    and image_grid_pinpoints args)."""
    kw = {}
    for src, dst in (
        ("mm_projector_type", "projector_type"),
        ("mm_hidden_size", "mm_hidden_size"),
        ("mm_spatial_pool_mode", "spatial_pool_mode"),
        ("mm_spatial_pool_stride", "spatial_pool_stride"),
        ("image_aspect_ratio", "image_aspect_ratio"),
        ("mm_patch_merge_type", "mm_patch_merge_type"),
        ("mm_newline_position", "mm_newline_position"),
    ):
        if cj.get(src) is not None:
            kw[dst] = cj[src]
    gp = cj.get("image_grid_pinpoints")
    if isinstance(gp, str):  # mm_utils.py accepts the stringified form
        import ast

        gp = ast.literal_eval(gp)
    if gp:
        kw["grid_pinpoints"] = tuple(tuple(int(v) for v in p) for p in gp)
    # tower geometry: known names map to their published configs; a
    # nested vision_tower_config dict (our own synth checkpoints) wins
    vt = cj.get("vision_tower_config")
    if isinstance(vt, dict):
        kw["siglip"] = SigLIPConfig(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in vt.items()
            if k in {f.name for f in dataclasses.fields(SigLIPConfig)}})
    return VisionConfig(**kw)


def config_from_checkpoint(path: str):
    """Sniff (LaViDaConfig, lm_family) from a checkpoint dir's config.json
    — the analogue of the reference builder's AutoConfig.from_pretrained
    step (builder.py:128-146), which is how a user loads any geometry
    without hand-building a config.  Returns (None, None) when no
    config.json exists (caller falls back to defaults)."""
    import json
    import os

    cfile = os.path.join(path, "config.json")
    if not os.path.exists(cfile):
        return None, None
    with open(cfile) as f:
        cj = json.load(f)
    mt = str(cj.get("model_type", "")).lower()
    if "dream" in mt or ("hidden_size" in cj and "d_model" not in cj
                         and "num_attention_heads" in cj):
        lm_family, lm = "dream", _sniff_dream(cj)
    else:
        lm_family, lm = "llada", _sniff_llada(cj)
    cfg = LaViDaConfig(
        llada=lm, vision=_sniff_vision(cj),
        tokenizer_model_max_length=cj.get("tokenizer_model_max_length"),
    )
    return cfg, lm_family


@dataclass(frozen=True)
class DreamGenerationConfig:
    """Dream sampler knobs (dream/generation_utils.py:99-147)."""

    max_new_tokens: int = 128
    steps: int = 512                    # clamped to max_new_tokens
    eps: float = 1e-3
    alg: str = "origin"                 # origin|maskgit_plus|topk_margin|entropy
    alg_temp: Optional[float] = None
    temperature: float = 0.0
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    schedule: Optional[str] = None
    schedule_shift: float = 3.0
    step_ratio: Optional[float] = None
    prefix_lm: bool = True

    def replace(self, **kw) -> "DreamGenerationConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class GenerationConfig:
    """Masked-diffusion sampling knobs (generate.py:117-128)."""

    max_new_tokens: int = 128
    block_length: int = 128
    steps: Optional[int] = None               # defaults to max_new_tokens
    step_per_block: Optional[int] = None
    step_ratio: Optional[float] = None
    temperature: float = 0.0
    remasking: str = "low_confidence"         # |random|entrophy|margin
    schedule: Optional[str] = None            # linear|cosine|logit_normal|shift
    schedule_shift: float = 3.0
    prefix_lm: bool = True                    # use the prefix KV cache

    def replace(self, **kw) -> "GenerationConfig":
        return dataclasses.replace(self, **kw)
