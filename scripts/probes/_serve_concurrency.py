"""Serving under concurrent load (VERDICT r4 item 7): N HTTP clients
against one worker, DecodeBatcher on/off — images/s, p50/p95 latency,
batcher occupancy.

The regime the reference's controller/worker stack targets
(/root/reference/llava/serve/model_worker.py:44-245 semaphore +
single-request generate); this rebuild adds micro-batching
(DecodeBatcher), so the question is what batching buys under real
concurrency, not just monolithic same-prompt batches (bench.py --batch).

Model: int8 weight-only 8B serving layout, zero weights (latency is
value-independent, bench.py convention).  Run on the real chip:

  python scripts/probes/_serve_concurrency.py --clients 8 --requests 2 \\
      --decode-batch 8
  python scripts/probes/_serve_concurrency.py --clients 8 --requests 2 \\
      --decode-batch 0          # no-batching baseline (semaphore only)

CPU smoke: JAX_PLATFORMS=cpu ... --tiny --clients 4 --requests 1
"""

import argparse
import base64
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=2,
                    help="sequential requests per client")
    ap.add_argument("--decode-batch", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=20.0)
    ap.add_argument("--gen-len", type=int, default=32)
    ap.add_argument("--port", type=int, default=0,
                    help="0 = pick a free port (two concurrent probes on "
                         "a fixed port silently cross-fire requests into "
                         "each other's worker — observed polluting a chip "
                         "measurement with a CPU smoke's warmup traffic)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--quant", default="int4", choices=["int8", "int4"],
                    help="8B serving layout (int4 = the batched "
                         "convention; int8 OOMs one v5e at bucket 8)")
    args = ap.parse_args()
    if args.port == 0:
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        args.port = s.getsockname()[1]
        s.close()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/lavida_mod_tpu/xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from lavida_mod_tpu.config import (
        LaViDaConfig, VisionConfig, tiny_llada_config, tiny_siglip_config,
    )
    from lavida_mod_tpu.eval.adapter import LavidaEvalModel
    from lavida_mod_tpu.models.lavida import LaViDa
    from lavida_mod_tpu.serve.worker import ModelWorker

    if args.tiny:
        cfg = LaViDaConfig(
            llada=tiny_llada_config(),
            vision=VisionConfig(
                siglip=tiny_siglip_config(), mm_hidden_size=32,
                grid_pinpoints=((56, 112), (112, 56), (112, 112)),
            ),
        )
        model = LaViDa.random_init(cfg, 0, jnp.float32)
    else:
        cfg = LaViDaConfig()  # 8B/so400m geometry
        # int4 W4A8 layout: the batched serving convention (bench --batch)
        # — the int8 tree (7.5G) + a B=8 merged KV cache (~7.9G) cannot
        # co-reside on one v5e (first probe run OOM'd at bucket 8)
        model = LaViDa.zero_init(cfg, jnp.bfloat16, quantized=args.quant)

    class _ToyTokenizer:
        bos_token_id = 1
        eos_token_id = 2
        chat_template = None

        def __call__(self, text):
            class R:
                input_ids = [1] + [10 + (ord(c) % 80) for c in text[:48]]

            return R()

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids)

    adapter = LavidaEvalModel(model, _ToyTokenizer(), conv_template="llada")
    adapter.stage_walls = []  # per-batch (B, encode_s, generate_s, detok_s)
    worker = ModelWorker(
        adapter, limit_concurrency=max(2, args.decode_batch),
        decode_batch=args.decode_batch, batch_window_ms=args.window_ms,
    )
    threading.Thread(
        target=worker.serve, args=("127.0.0.1", args.port), daemon=True
    ).start()
    time.sleep(0.5)

    # one test image per client (identical pixels are fine — transport and
    # encode run per request; prompts differ per request)
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    side = 112 if args.tiny else 640
    Image.fromarray(rng.integers(0, 255, (side, side, 3),
                                 dtype=np.uint8)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    gen_kwargs = {"max_new_tokens": args.gen_len, "prefix_lm": True}

    def fire(prompt: str) -> dict:
        req = urllib.request.Request(
            f"http://127.0.0.1:{args.port}/worker_generate",
            json.dumps({"prompt": prompt, "images": [b64],
                        "gen_kwargs": gen_kwargs}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=3600) as r:
            return json.loads(r.read())

    # warmup: compile every batch bucket the batcher can form (1,2,4,..,
    # max) so the measurement sees steady state, not compile walls.
    # Error-checked: a silent warmup OOM poisons the whole measurement
    # (first chip run: int8+B=8 KV OOM surfaced only as 16 failed
    # measurement requests)
    buckets = [1]
    while args.decode_batch > 1 and buckets[-1] < args.decode_batch:
        buckets.append(buckets[-1] * 2)
    for b in buckets:
        t0 = time.perf_counter()
        outs = [None] * b

        def warm(i, b=b, outs=outs):
            outs[i] = fire(f"warm {i} bucket {b}")

        th = [threading.Thread(target=warm, args=(i,)) for i in range(b)]
        for t in th:
            t.start()
        for t in th:
            t.join()
        errs = [o for o in outs if o and o.get("error_code")]
        print(f"[warmup] bucket {b}: {time.perf_counter() - t0:.1f}s"
              + (f"  ERRORS {len(errs)}/{b}: {errs[0].get('error')}"
                 if errs else ""),
              flush=True)
        if errs and b == args.decode_batch:
            print(json.dumps({
                "metric": "serve_concurrency_images_per_s", "value": 0.0,
                "unit": "img/s", "decode_batch": args.decode_batch,
                "quant": "tiny" if args.tiny else args.quant,
                "error": f"bucket {b} failed: {errs[0].get('error')}",
            }), flush=True)
            return

    # measurement: clients fire sequentially, all starting together
    lat = []
    lat_lock = threading.Lock()
    occ_start = len(worker.batcher.served_sizes) if worker.batcher else 0
    sw_start = len(adapter.stage_walls)
    t_start = time.perf_counter()

    failures = []

    def client(cid: int):
        for r in range(args.requests):
            t0 = time.perf_counter()
            out = fire(f"client {cid} request {r}: describe region {cid+r}")
            dt = time.perf_counter() - t0
            with lat_lock:
                if out.get("error_code") == 0:
                    lat.append(dt)
                else:
                    failures.append(out.get("error", "?"))

    th = [threading.Thread(target=client, args=(c,))
          for c in range(args.clients)]
    for t in th:
        t.start()
    for t in th:
        t.join()
    wall = time.perf_counter() - t_start

    lat.sort()
    n = len(lat)
    if n == 0:
        print(json.dumps({"metric": "serve_concurrency_images_per_s",
                          "value": 0.0, "unit": "img/s",
                          "failures": failures[:2]}), flush=True)
        return
    p50 = lat[n // 2]
    p95 = lat[min(n - 1, int(n * 0.95))]
    occ = (worker.batcher.served_sizes[occ_start:]
           if worker.batcher else [])
    result = {
        "metric": "serve_concurrency_images_per_s",
        "value": round(n / wall, 4),
        "unit": "img/s",
        "clients": args.clients,
        "requests": n,
        "decode_batch": args.decode_batch,
        "quant": "tiny" if args.tiny else args.quant,
        "wall_s": round(wall, 3),
        "p50_s": round(p50, 3),
        "p95_s": round(p95, 3),
        "batcher_sizes": occ,
        "mean_real_batch": (round(sum(r for r, _ in occ) /
                                  max(len(occ), 1), 2) if occ else 1.0),
        "failed_requests": len(failures),
        # per-batch (B, encode_s, generate_s, detok_s) from the adapter's
        # opt-in instrumentation — where the batch wall actually goes
        "stage_walls": adapter.stage_walls[sw_start:],
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
