"""Vision-tower registry (reference multimodal_encoder/builder.py:13-52).

Name-based dispatch: "siglip" (LaViDa's tower — including the
`use_original_encoder` flag, which in this rebuild is the same
implementation: the fork's original_siglip_encoder.py differs from
siglip_encoder.py only by SHIRG plumbing), "clip" (+"s2" multi-scale).

The reference additionally lists eva_clip / open_clip / mlcd / imagebind /
hf towers (several commented out of its own builder); they are registered
here as explicit unsupported entries so configuration errors are loud.
"""

from __future__ import annotations

from typing import Callable

from ..config import SigLIPConfig


def build_vision_tower(name: str, **kw) -> tuple[object, Callable]:
    """Returns (cfg, forward_fn(params, cfg, pixel_values, **kw))."""
    lname = name.lower()
    if "siglip" in lname:
        from . import siglip

        cfg = kw.pop("cfg", None) or SigLIPConfig()
        return cfg, siglip.forward
    if any(t in lname for t in ("eva", "open_clip", "mlcd", "imagebind")):
        raise NotImplementedError(
            f"tower family '{name}' is registered but not implemented in "
            "this build (the reference keeps these as optional legacy "
            "towers; LaViDa uses SigLIP)"
        )
    if "clip" in lname:
        from . import clip

        cfg = kw.pop("cfg", None) or clip.clip_vit_l_config()
        if kw.pop("s2", False) or "s2" in lname:
            return cfg, clip.s2_forward
        return cfg, clip.forward
    raise ValueError(f"Unknown vision tower: {name}")
