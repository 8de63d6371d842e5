"""Save/restore walls at the 8B scale: sync vs async orbax (VERDICT r4
item 6 — "no save/restore wall ever measured at scale").

Builds the full 8B-geometry bf16 LLaDA tree HOST-side (zeros: orbax's
default zarr path writes raw bytes, so the wall is value-independent) and
times:
  - sync save (the chips-stalled-for-everything baseline: what
    PyTreeCheckpointer cost per save before round 5),
  - async save staged-return (what the chips now stall for) and
    background commit (overlaps training),
  - restore with a sharding-free template.

CPU-backend only — run any time: JAX_PLATFORMS=cpu python scripts/probes/_ckpt_wall.py
"""

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from lavida_mod_tpu.config import LaViDaConfig
from lavida_mod_tpu.models import llada as jl
from lavida_mod_tpu.utils import (
    restore_checkpoint, save_checkpoint, wait_for_saves,
)


def main():
    cfg = LaViDaConfig()
    shapes = jax.eval_shape(
        lambda k: jl.init_params(cfg.llada, k, jnp.bfloat16),
        jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda s: np.zeros(s.shape, jnp.bfloat16.dtype), shapes)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"tree: {nbytes / 2**30:.2f} GiB bf16 (8B llada geometry)")

    base = "/tmp/ckpt_wall"
    shutil.rmtree(base, ignore_errors=True)

    t0 = time.time()
    p_sync = save_checkpoint(base + "/sync", 1, params)
    t_sync = time.time() - t0
    print(f"sync save wall: {t_sync:.1f}s "
          f"({nbytes / 2**30 / t_sync:.2f} GiB/s)")

    t0 = time.time()
    p_async = save_checkpoint(base + "/async", 1, params, async_save=True)
    t_staged = time.time() - t0
    t0 = time.time()
    wait_for_saves()
    t_commit = time.time() - t0
    print(f"async save: staged-return {t_staged:.1f}s (the chip stall), "
          f"background commit {t_commit:.1f}s (overlaps training)")

    t0 = time.time()
    restored = restore_checkpoint(p_async, {"params": params, "step": 0})
    t_restore = time.time() - t0
    print(f"restore wall: {t_restore:.1f}s")
    assert int(restored["step"]) == 1

    shutil.rmtree(base, ignore_errors=True)
    print(f"VERDICT: async shrinks the per-save training stall "
          f"{t_sync:.1f}s -> {t_staged:.1f}s "
          f"({t_sync / max(t_staged, 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
