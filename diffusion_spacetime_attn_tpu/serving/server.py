"""Production serving: dynamic request batching over the warm-jitted pipeline.

The reference has no serving story — its deployment unit is a 500-prompt
shell loop with one process per GPU (`scripts/txt2img-gpt.py:303-305`,
SURVEY §2.5).  Serving is where the TPU design pays off directly: XLA
programs are shape-specialized, so the engine compiles ONE program at a
fixed batch size and the batcher packs concurrent requests into it (padding
the tail with empty prompts).  Per-request seeds are an explicit [B] operand
folded into per-row PRNG keys inside the jitted program — requests are
bit-reproducible regardless of which batch they landed in.

Components:
  * TextToImageEngine — tokenize → encode → sample → decode, one jit at a
    static batch size; per-row seeds; optional invisible watermark.
  * BatchingService — thread-safe queue: submit() returns a Future; a worker
    thread drains up to `batch_size` requests (waiting ≤ max_wait_s to fill
    the batch) and runs them in one device program.
  * serve() — stdlib ThreadingHTTPServer: POST /txt2img, GET /healthz.
"""
from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class TextToImageEngine:
    """Shape-specialized txt2img program at a fixed batch size."""

    sd: object                                  # pipeline.StableDiffusion
    tokenize: Callable[[str], Sequence[int]]    # text → fixed-len ids
    batch_size: int = 8
    sampler: str = "plms"
    guidance_scale: Optional[float] = None
    watermark: Optional[str] = None             # payload string or None
    _generate: object = field(default=None, repr=False)
    _uncond_ids: object = field(default=None, repr=False)

    def __post_init__(self):
        latent = self.sd.cfg.spacetime.latent_size
        in_ch = self.sd.cfg.unet.in_channels

        def generate(token_ids: jnp.ndarray, uncond_ids: jnp.ndarray,
                     seeds: jnp.ndarray) -> jnp.ndarray:
            cond = self.sd.encode_text(token_ids)
            uncond = self.sd.encode_text(uncond_ids)
            gs = (self.sd.cfg.spacetime.guidance_scale
                  if self.guidance_scale is None else self.guidance_scale)
            eps_fn = self.sd.make_eps_fn(cond, uncond, gs)
            x_T = jax.vmap(
                lambda s: jax.random.normal(
                    jax.random.PRNGKey(s), (latent, latent, in_ch), jnp.float32
                )
            )(seeds)
            z = self.sd.sample_from(eps_fn, x_T, sampler=self.sampler)
            return self.sd.decode_latents(z)

        self._generate = jax.jit(generate)
        self._uncond_ids = np.asarray(self.tokenize(""), np.int32)

    def warmup(self) -> float:
        """Compile the program (returns seconds).  Call before serving."""
        t0 = time.time()
        ids = np.tile(self._uncond_ids, (self.batch_size, 1))
        jax.block_until_ready(self._run(ids, np.zeros(self.batch_size, np.int64)))
        return time.time() - t0

    def _run(self, token_ids: np.ndarray, seeds: np.ndarray):
        uncond = np.tile(self._uncond_ids, (self.batch_size, 1))
        return self._generate(
            jnp.asarray(token_ids, jnp.int32), jnp.asarray(uncond),
            jnp.asarray(seeds, jnp.uint32),
        )

    def generate_batch(self, prompts: List[str], seeds: List[int]) -> np.ndarray:
        """≤ batch_size prompts → [len(prompts), H, W, 3] uint8."""
        n = len(prompts)
        assert 0 < n <= self.batch_size
        pad = self.batch_size - n
        ids = np.stack(
            [np.asarray(self.tokenize(p), np.int32) for p in prompts]
            + [self._uncond_ids] * pad
        )
        s = np.asarray(list(seeds) + [0] * pad, np.int64)
        imgs = np.asarray(self._run(ids, s))[:n]
        imgs = (imgs * 255.0 + 0.5).astype(np.uint8)
        if self.watermark:
            from ..utils.watermark import embed_watermark

            imgs = np.stack([embed_watermark(im, self.watermark) for im in imgs])
        return imgs


@dataclass
class _Request:
    prompt: str
    seed: int
    future: Future


class BatchingService:
    """Thread-safe dynamic batcher in front of a TextToImageEngine."""

    def __init__(self, engine: TextToImageEngine, max_wait_s: float = 0.2):
        self.engine = engine
        self.max_wait_s = max_wait_s
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self.stats = {"requests": 0, "batches": 0, "batched_rows": 0}

    def start(self):
        self._worker.start()
        return self

    def stop(self):
        self._stop.set()
        self._worker.join(timeout=5)

    def submit(self, prompt: str, seed: int = 1) -> Future:
        fut: Future = Future()
        self._q.put(_Request(prompt, seed, fut))
        self.stats["requests"] += 1
        return fut

    def _drain(self) -> List[_Request]:
        """Block for one request, then gather more until the batch is full or
        max_wait_s elapses (classic dynamic batching)."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.time() + self.max_wait_s
        while len(batch) < self.engine.batch_size:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._drain()
            if not batch:
                continue
            try:
                imgs = self.engine.generate_batch(
                    [r.prompt for r in batch], [r.seed for r in batch]
                )
                for r, img in zip(batch, imgs):
                    r.future.set_result(img)
                self.stats["batches"] += 1
                self.stats["batched_rows"] += len(batch)
            except Exception as e:  # surface, don't kill the worker
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)


def _png_bytes(img: np.ndarray) -> bytes:
    try:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        return buf.getvalue()
    except Exception:  # PIL-free fallback: raw npy
        buf = io.BytesIO()
        np.save(buf, img)
        return buf.getvalue()


def serve(service: BatchingService, host: str = "0.0.0.0", port: int = 8000,
          block: bool = True):
    """HTTP front: POST /txt2img {"prompt", "seed"?} → {"image": b64 PNG};
    GET /healthz → service stats."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, **service.stats})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/txt2img":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                fut = service.submit(str(req["prompt"]), int(req.get("seed", 1)))
                img = fut.result()
                self._json(200, {
                    "image": base64.b64encode(_png_bytes(img)).decode(),
                    "shape": list(img.shape),
                })
            except Exception as e:
                self._json(500, {"error": repr(e)})

        def log_message(self, *a):  # quiet
            pass

    httpd = ThreadingHTTPServer((host, port), Handler)
    if block:
        httpd.serve_forever()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd
