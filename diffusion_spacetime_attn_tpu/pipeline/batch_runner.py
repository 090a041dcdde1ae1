"""Batched + mesh-sharded dataset runner.

The reference parallelizes 500-prompt sweeps by launching one process per
GPU with hand-edited index ranges and a `process_id` file namespace
(SURVEY §2.5).  TPU-native replacement: prompts are packed into fixed-shape
batches of size B = k·(data-axis size); ONE jitted program (per mode)
processes each batch, sharded over the mesh's data axis with model params
replicated (or TP-sharded on the model axis).  Per-prompt weight
optimization is independent, so the only cross-chip traffic is the initial
parameter broadcast — the design invariant from SURVEY §2.5.

Prompts whose layout fails are packed with active=0 (their blend and losses
are exact no-ops) and reported as skipped.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import shard_batch
from .runners import PromptRunner, save_image
from .spacetime import (
    SpaceTimeInputs,
    init_coef,
    make_final_forward,
    make_train_step,
    model_params,
)


@dataclasses.dataclass
class BatchedRunner:
    """Wraps a PromptRunner with fixed-size batching and optional mesh
    sharding.  One compile per (mode, batch_size)."""

    runner: PromptRunner
    batch_size: int = 4
    mesh: Optional[object] = None  # jax.sharding.Mesh

    def _dummy_host(self) -> dict:
        """Inactive filler slot (empty caption, no objects; active = 0 so
        all blends and losses are exact no-ops)."""
        r = self.runner
        N = r.cfg.max_objects
        empty = np.asarray(r.clip_tokenize(""), np.int32)
        return dict(
            centers=np.full((N, 2), 0.5, np.float32),
            active=np.zeros(N, np.float32),
            local_texts=[""] * N,
            obj_tokens=np.stack([empty] * N),
            caption_tokens=empty,
            prompt="",
        )

    def _prep_chunk(self, prompts, chunk):
        """Host-only stage: layout NLP + tokenization for one chunk."""
        r = self.runner
        hosts, ok_idx = [], []
        for idx in chunk:
            h = r.prepare_host(prompts[idx])
            if h is None:
                print(f"[skip] no layout for prompt {idx}")
                hosts.append(self._dummy_host())
                ok_idx.append(None)
            else:
                hosts.append(h)
                ok_idx.append(idx)
        while len(hosts) < self.batch_size:  # tail padding
            hosts.append(self._dummy_host())
            ok_idx.append(None)
        return hosts, ok_idx

    def _launch(self, batch, train_ctx):
        """Dispatch all device work for one batch WITHOUT blocking (jax
        dispatch is async; the caller syncs with np.asarray later)."""
        r = self.runner
        cfg = r.cfg
        if r.mode == "spacetime":
            optimizer, train_step, final_forward, params = train_ctx
            coef = init_coef(batch.active, cfg.num_steps, cfg.init_coef)
            opt_state = optimizer.init(coef)
            # the reference saves during the FINAL epoch's forward, before
            # the last optimizer step (`plms.py:280-288`) — so the last
            # epoch runs forward-only (identical image, one backward saved)
            epoch_images = {}
            for e in range(cfg.epochs - 1):
                coef, opt_state, loss, images = train_step(
                    params, coef, opt_state, batch
                )
                if r.save_epoch_images:
                    epoch_images[e] = images
            _, images = final_forward(params, coef, batch)
            return images, epoch_images
        from ..ops.attention import SpatialControl

        control = None
        coef = None
        if r.mode == "spatial":
            per = cfg.init_coef / jnp.clip(
                jnp.sum(batch.active, -1, keepdims=True), 1, None
            )
            control = SpatialControl(
                batch.local_contexts, batch.centers,
                per * batch.active, batch.active,
            )
            coef = jnp.repeat(control.coef[..., None], cfg.num_steps, -1)
        eps = r.sd.make_eps_fn(
            batch.cond, batch.uncond, cfg.guidance_scale, control, coef
        )
        z = r.sd.sample_from(eps, batch.x_T, r.sampler, remat=False)
        return r.sd.decode_latents(z), {}

    def run(
        self,
        prompts: List[str],
        indices: Optional[List[int]] = None,
        seed: int = 1,
        log=None,
        on_chunk_done=None,
    ) -> int:
        """Software-pipelined sweep: while the device runs batch i, the host
        prepares batch i+1's layout/NLP (SURVEY §7: overlap the un-jittable
        frontend with TPU compute across the prompt stream).  jax's async
        dispatch provides the overlap — the only sync point is reading
        batch i's images back.

        `on_chunk_done(chunk_indices)` fires after each chunk's images are
        on disk — run_dataset.py checkpoints its resume manifest there, so a
        killed sweep loses at most one batch (the reference's per-process
        `start` bookkeeping, `txt2img-gpt.py:303`, is all-or-nothing)."""
        r = self.runner
        cfg = r.cfg
        indices = indices if indices is not None else list(range(len(prompts)))
        train_ctx = None
        if r.mode == "spacetime":
            optimizer, train_step = make_train_step(
                r.sd, r.clip_loss, cfg, sampler=r.sampler
            )
            final_forward = make_final_forward(
                r.sd, r.clip_loss, cfg, sampler=r.sampler
            )
            params = model_params(r.sd, r.clip_loss)
            if self.mesh is not None:
                from ..parallel.mesh import replicate

                params = replicate(self.mesh, params)
            train_ctx = (optimizer, train_step, final_forward, params)

        produced = 0
        B = self.batch_size
        chunks = [indices[s: s + B] for s in range(0, len(indices), B)]
        if not chunks:
            return 0

        hosts, ok_idx = self._prep_chunk(prompts, chunks[0])
        for ci, chunk in enumerate(chunks):
            t0 = time.perf_counter()
            batch = r.assemble_inputs(hosts, seed)
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            images, epoch_images = self._launch(batch, train_ctx)  # async
            if ci + 1 < len(chunks):                    # overlaps device work
                next_hosts, next_ok = self._prep_chunk(prompts, chunks[ci + 1])
            images = np.asarray(images)                 # sync point
            dt = time.perf_counter() - t0
            for img, idx in zip(images, ok_idx):
                if idx is None:
                    continue
                save_image(
                    img,
                    os.path.join(
                        r.outdir, f"final{cfg.epochs - 1}_s{seed}_index_{idx}.png"
                    ),
                )
                produced += 1
            for e, imgs in epoch_images.items():        # --save-epochs only
                for img, idx in zip(np.asarray(imgs), ok_idx):
                    if idx is not None:
                        save_image(img, os.path.join(
                            r.outdir, f"final{e}_s{seed}_index_{idx}.png"))
            if log:
                log.log(
                    "batch_done", first=chunk[0], n=len(chunk),
                    seconds=round(dt, 3),
                )
            if on_chunk_done is not None:
                on_chunk_done(list(chunk))
            if ci + 1 < len(chunks):
                hosts, ok_idx = next_hosts, next_ok
        return produced
