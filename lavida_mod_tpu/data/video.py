"""Video frame extraction (reference llava/utils.py:25-72
process_video_with_decord).

decord/pyav are absent from this environment (the reference degrades to a
printed warning in the same situation, llava/utils.py:21-23); PIL covers
multi-frame containers (GIF/animated WebP/TIFF), and a pre-extracted frame
directory works for everything else.  Output: a list of PIL frames the
multimodal pipeline treats as views of one "video" image.
"""

from __future__ import annotations

import os
from typing import Sequence


def sample_frame_indices(total: int, num_frames: int) -> list[int]:
    if total <= num_frames:
        return list(range(total))
    step = total / num_frames
    return [min(int(i * step), total - 1) for i in range(num_frames)]


def load_video_frames(path: str, num_frames: int = 8) -> list:
    """GIF/animated-image file OR directory of frame images -> PIL frames."""
    from PIL import Image, ImageSequence

    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
        )
        idx = sample_frame_indices(len(files), num_frames)
        return [
            Image.open(os.path.join(path, files[i])).convert("RGB")
            for i in idx
        ]
    im = Image.open(path)
    frames = [f.convert("RGB") for f in ImageSequence.Iterator(im)]
    idx = sample_frame_indices(len(frames), num_frames)
    return [frames[i] for i in idx]


def frames_to_views(frames: Sequence, processor) -> "np.ndarray":
    """Frames -> [F, C, S, S] square views (video path skips anyres; the
    reference pools each frame with get_2dPool like a base view)."""
    import numpy as np

    return np.stack([processor(f) for f in frames], axis=0)
