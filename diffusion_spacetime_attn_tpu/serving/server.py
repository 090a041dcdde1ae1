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
from concurrent.futures import TimeoutError as _FuturesTimeout
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class TextToImageEngine:
    """Shape-specialized txt2img program at a fixed batch size.

    With `prepare_host` set (e.g. `PromptRunner.prepare_host` — layout
    prediction + object extraction on the host), requests run with the
    paper's spatial attention control: per-object local contexts, circular
    region masks and fixed blend weights `init_coef/N` (the reference's
    initialization, `plms.py:204-214`).  Prompts whose layout fails fall
    back to vanilla rows (zeroed `active` masks are exact no-ops).
    """

    sd: object                                  # pipeline.StableDiffusion
    tokenize: Callable[[str], Sequence[int]]    # text → fixed-len ids
    batch_size: int = 8
    sampler: str = "plms"
    guidance_scale: Optional[float] = None
    watermark: Optional[str] = None             # payload string or None
    prepare_host: Optional[Callable] = None     # prompt → dict | None (spatial)
    init_coef: Optional[float] = None           # default: cfg.spacetime.init_coef
    mesh: Optional[object] = None               # jax.sharding.Mesh: shard the
    # request batch over its 'data' axis (params replicated) — one server
    # drives a whole slice instead of one chip; batch_size must divide by
    # the data-axis size
    _generate: object = field(default=None, repr=False)
    _uncond_ids: object = field(default=None, repr=False)

    def __post_init__(self):
        from ..ops.attention import SpatialControl

        latent = self.sd.cfg.spacetime.latent_size
        in_ch = self.sd.cfg.unet.in_channels
        N = self.sd.cfg.spacetime.max_objects
        S = self.sd.schedule.num_steps
        spatial = self.prepare_host is not None

        import dataclasses as _dc

        def generate(params, token_ids, uncond_ids, seeds, local_ids, centers,
                     active):
            # params as explicit operands — closing over them would bake GBs
            # of constants into the executable (tunnel remote-compile rejects
            # large request bodies, and compile time explodes)
            sd = _dc.replace(self.sd, unet_params=params[0],
                             vae_params=params[1], text_params=params[2])
            B = token_ids.shape[0]
            if spatial:
                # one encoder call for captions + all local contexts
                all_ids = jnp.concatenate(
                    [token_ids, local_ids.reshape(B * N, -1)]
                )
                emb = sd.encode_text(all_ids)
                cond, locals_ = emb[:B], emb[B:].reshape(B, N, *emb.shape[1:])
                coef = active * (
                    (self.init_coef
                     if self.init_coef is not None
                     else self.sd.cfg.spacetime.init_coef)
                    / jnp.maximum(jnp.sum(active, -1, keepdims=True), 1.0)
                )
                control = SpatialControl(
                    local_contexts=locals_, centers=centers,
                    coef=coef, active=active,
                )
                coef_schedule = jnp.broadcast_to(coef[..., None], (B, N, S))
            else:
                cond = sd.encode_text(token_ids)
                control, coef_schedule = None, None
            uncond = sd.encode_text(uncond_ids)
            gs = (sd.cfg.spacetime.guidance_scale
                  if self.guidance_scale is None else self.guidance_scale)
            eps_fn = sd.make_eps_fn(cond, uncond, gs, control, coef_schedule)
            x_T = jax.vmap(
                lambda s: jax.random.normal(
                    jax.random.PRNGKey(s), (latent, latent, in_ch), jnp.float32
                )
            )(seeds)
            z = sd.sample_from(eps_fn, x_T, sampler=self.sampler)
            img = sd.decode_latents(z)
            # uint8 on device: 4× less host transfer than f32 over the tunnel
            return (img * 255.0 + 0.5).astype(jnp.uint8)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ndata = self.mesh.shape["data"]
            if self.batch_size % ndata:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by the "
                    f"mesh data axis ({ndata})")
            rep = NamedSharding(self.mesh, P())
            row = NamedSharding(self.mesh, P("data"))
            params_sh = jax.tree_util.tree_map(lambda _: rep,
                                               (self.sd.unet_params,
                                                self.sd.vae_params,
                                                self.sd.text_params))
            self._generate = jax.jit(
                generate,
                in_shardings=(params_sh, row, row, row, row, row, row),
                out_shardings=row,
            )
        else:
            self._generate = jax.jit(generate)
        self._uncond_ids = np.asarray(self.tokenize(""), np.int32)

    def warmup(self) -> float:
        """Compile the program (returns seconds).  Call before serving."""
        t0 = time.time()
        ids = np.tile(self._uncond_ids, (self.batch_size, 1))
        jax.block_until_ready(self._run(ids, np.zeros(self.batch_size, np.int64)))
        return time.time() - t0

    def _hosts(self, prompts: List[str]):
        """Host stage per prompt: layout + local prompts; None → vanilla row."""
        N = self.sd.cfg.spacetime.max_objects
        L = self._uncond_ids.shape[0]
        local_ids = np.tile(self._uncond_ids, (len(prompts), N, 1))
        centers = np.zeros((len(prompts), N, 2), np.float32)
        active = np.zeros((len(prompts), N), np.float32)
        for i, p in enumerate(prompts):
            h = self.prepare_host(p)
            if h is None:
                continue
            centers[i], active[i] = h["centers"], h["active"]
            for j, t in enumerate(h["local_texts"][:N]):
                if t:
                    local_ids[i, j] = np.asarray(self.tokenize(t), np.int32)[:L]
        return local_ids, centers, active

    def _run(self, token_ids: np.ndarray, seeds: np.ndarray,
             local_ids=None, centers=None, active=None):
        B, N = self.batch_size, self.sd.cfg.spacetime.max_objects
        uncond = np.tile(self._uncond_ids, (B, 1))
        if local_ids is None:
            local_ids = np.tile(self._uncond_ids, (B, N, 1))
            centers = np.zeros((B, N, 2), np.float32)
            active = np.zeros((B, N), np.float32)
        params = (self.sd.unet_params, self.sd.vae_params, self.sd.text_params)
        return self._generate(
            params,
            jnp.asarray(token_ids, jnp.int32), jnp.asarray(uncond),
            jnp.asarray(seeds, jnp.uint32), jnp.asarray(local_ids, jnp.int32),
            jnp.asarray(centers, jnp.float32), jnp.asarray(active, jnp.float32),
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
        if self.prepare_host is not None:
            local_ids, centers, active = self._hosts(prompts)
            z = np.zeros  # pad rows: inactive control
            local_ids = np.concatenate(
                [local_ids, np.tile(self._uncond_ids,
                                    (pad, local_ids.shape[1], 1))]
            ) if pad else local_ids
            centers = np.concatenate(
                [centers, z((pad,) + centers.shape[1:], np.float32)]
            ) if pad else centers
            active = np.concatenate(
                [active, z((pad,) + active.shape[1:], np.float32)]
            ) if pad else active
            imgs = np.asarray(self._run(ids, s, local_ids, centers, active)[:n])
        else:
            imgs = np.asarray(self._run(ids, s)[:n])
        if self.watermark:
            from ..utils.watermark import embed_watermark

            imgs = np.stack([embed_watermark(im, self.watermark) for im in imgs])
        return imgs


@dataclass
class SpaceTimeEngine:
    """Full-method serving: per-request temporal weight optimization.

    Every batch runs the paper's complete pipeline — layout prediction on
    the host, then `cfg.epochs` Adam epochs whose gradients flow through
    the whole sampling chain (`pipeline/spacetime.py`) — and returns the
    fidelity-optimized images.  A serving mode the reference cannot offer
    at all (its method is a 500-prompt offline shell loop); with splash
    attention + DPM++2M @ 20 steps this is ~4.2 s per optimized image at
    batch 8 on one v5e chip.

    Prompts whose layout fails still generate: their rows carry zero
    `active` masks, so the blend and the per-object losses are exact no-ops
    and the row degenerates to vanilla sampling of the same seed.

    Duck-types `TextToImageEngine` for `BatchingService` (`batch_size`,
    `generate_batch`, `warmup`).
    """

    runner: object                       # pipeline.runners.PromptRunner
    batch_size: int = 4
    watermark: Optional[str] = None
    mesh: Optional[object] = None        # shard the request batch over the
    # mesh's 'data' axis (params replicated or TP-sharded by the caller via
    # parallel.sharding.shard_params) — one full-method server per slice
    _train_step: object = field(default=None, repr=False)
    _optimizer: object = field(default=None, repr=False)
    _final_forward: object = field(default=None, repr=False)

    def __post_init__(self):
        from ..pipeline.spacetime import make_final_forward, make_train_step

        if self.mesh is not None:
            ndata = self.mesh.shape["data"]
            if self.batch_size % ndata:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by the "
                    f"mesh data axis ({ndata})")
        self._optimizer, self._train_step = make_train_step(
            self.runner.sd, self.runner.clip_loss, self.runner.cfg,
            sampler=self.runner.sampler,
        )
        self._final_forward = make_final_forward(
            self.runner.sd, self.runner.clip_loss, self.runner.cfg,
            sampler=self.runner.sampler,
        )

    def _empty_host(self, prompt: str) -> dict:
        """Vanilla-equivalent host record (no objects)."""
        N = self.runner.cfg.max_objects
        ct = np.asarray(self.runner.clip_tokenize(prompt), np.int32)
        empty = np.asarray(self.runner.clip_tokenize(""), np.int32)
        return dict(
            centers=np.zeros((N, 2), np.float32),
            active=np.zeros(N, np.float32),
            local_texts=[""] * N,
            obj_tokens=np.tile(empty, (N, 1)),
            caption_tokens=ct,
            prompt=prompt,
        )

    def warmup(self) -> float:
        t0 = time.time()
        self.generate_batch([""], [0])
        return time.time() - t0

    def generate_batch(self, prompts: List[str], seeds: List[int]) -> np.ndarray:
        from ..pipeline.spacetime import optimize_prompt

        n = len(prompts)
        assert 0 < n <= self.batch_size
        hosts = [self.runner.prepare_host(p) or self._empty_host(p)
                 for p in prompts]
        hosts += [self._empty_host("")] * (self.batch_size - n)
        inputs = self.runner.assemble_inputs(hosts, seed=0)
        # per-request reproducible noise regardless of batch packing
        lat = self.runner.cfg.latent_size
        in_ch = self.runner.sd.cfg.unet.in_channels
        all_seeds = list(seeds) + [0] * (self.batch_size - n)
        x_T = jnp.stack([
            jax.random.normal(jax.random.PRNGKey(int(s)), (lat, lat, in_ch),
                              jnp.float32)
            for s in all_seeds
        ])
        inputs = inputs._replace(x_T=x_T)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            # batch axis on 'data'; GSPMD propagates through the jitted step
            inputs = shard_batch(self.mesh, inputs)
        images, _, _ = optimize_prompt(
            self.runner.sd, self.runner.clip_loss, inputs, self.runner.cfg,
            sampler=self.runner.sampler, train_step=self._train_step,
            optimizer=self._optimizer, final_forward=self._final_forward,
        )
        imgs = (np.asarray(images)[:n] * 255.0 + 0.5).clip(0, 255).astype(np.uint8)
        if self.watermark:
            from ..utils.watermark import embed_watermark

            imgs = np.stack([embed_watermark(im, self.watermark) for im in imgs])
        return imgs


class ServiceSaturated(Exception):
    """Raised by submit() when the bounded queue is full (backpressure —
    the HTTP front maps this to 503)."""


@dataclass
class _Request:
    prompt: str
    seed: int
    future: Future
    enqueued_at: float = 0.0


class BatchingService:
    """Thread-safe dynamic batcher in front of a TextToImageEngine.

    Production hardening (the raw engine has none of this):
      * bounded queue (`max_queue`, default 8× batch) — `submit` raises
        `ServiceSaturated` instead of growing without bound while a slow
        compile or stuck device backs traffic up;
      * per-request timeout (`request_timeout_s`): requests that waited too
        long in the queue are expired with TimeoutError *before* wasting a
        device batch on them.
    """

    def __init__(self, engine: TextToImageEngine, max_wait_s: float = 0.2,
                 max_queue: Optional[int] = None,
                 request_timeout_s: Optional[float] = None,
                 batch_allowance_s: float = 120.0):
        self.engine = engine
        self.max_wait_s = max_wait_s
        self.request_timeout_s = request_timeout_s
        # batch_allowance_s: extra client-side wait on top of the queue
        # budget to cover ONE batch execution (spacetime b8 ≈ 34 s)
        self.batch_allowance_s = batch_allowance_s
        maxsize = max_queue if max_queue is not None else 8 * engine.batch_size
        self._q: "queue.Queue[_Request]" = queue.Queue(maxsize=maxsize)
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self.stats = {"requests": 0, "batches": 0, "batched_rows": 0,
                      "rejected": 0, "timed_out": 0}

    def start(self):
        self._worker.start()
        return self

    def stop(self):
        self._stop.set()
        self._worker.join(timeout=5)

    def queue_depth(self) -> int:
        return self._q.qsize()

    def submit(self, prompt: str, seed: int = 1) -> Future:
        fut: Future = Future()
        try:
            self._q.put_nowait(_Request(prompt, seed, fut, time.time()))
        except queue.Full:
            self.stats["rejected"] += 1
            raise ServiceSaturated(
                f"queue full ({self._q.maxsize} pending)") from None
        self.stats["requests"] += 1
        return fut

    def _expired(self, r: _Request) -> bool:
        if self.request_timeout_s is None:
            return False
        if time.time() - r.enqueued_at <= self.request_timeout_s:
            return False
        self.stats["timed_out"] += 1
        if not r.future.done():
            r.future.set_exception(
                TimeoutError(f"request waited > {self.request_timeout_s}s"))
        return True

    def _drain(self) -> List[_Request]:
        """Block for one request, then gather more until the batch is full or
        max_wait_s elapses (classic dynamic batching).  Expired requests are
        failed fast and never reach the device."""
        batch: List[_Request] = []
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return batch
        if not self._expired(first):
            batch.append(first)
        deadline = time.time() + self.max_wait_s
        while len(batch) < self.engine.batch_size:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                r = self._q.get(timeout=max(remaining, 0.001) if batch else 0.1)
            except queue.Empty:
                break
            if not self._expired(r):
                batch.append(r)
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
                self._json(200, {"ok": True, "queue_depth": service.queue_depth(),
                                 **service.stats})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/txt2img":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                try:
                    fut = service.submit(str(req["prompt"]),
                                         int(req.get("seed", 1)))
                except ServiceSaturated as e:
                    self._json(503, {"error": str(e), "retry_after_s": 1})
                    return
                # end-to-end deadline = queue-wait budget (request_timeout_s,
                # enforced by the worker) + batch-execution allowance.  The
                # allowance must cover one full device batch (spacetime b8 is
                # ~34 s), else requests 504 client-side while the device still
                # computes — hence a separate, generous default.
                deadline = None
                if service.request_timeout_s:
                    deadline = (service.request_timeout_s
                                + service.batch_allowance_s)
                img = fut.result(timeout=deadline)
                self._json(200, {
                    "image": base64.b64encode(_png_bytes(img)).decode(),
                    "shape": list(img.shape),
                })
            except (TimeoutError, _FuturesTimeout) as e:
                self._json(504, {"error": f"timeout: {e}"})
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
