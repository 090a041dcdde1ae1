"""Dataset runners: gpt / mscoco / vsr prompt sets, end to end.

Reference: `scripts/txt2img-{gpt,mscoco,vsr}.py` — 500 prompts each, layout
inference per prompt, per-object CLIP contexts saved to `.pt` files, PLMS
sampling with 3-epoch weight optimization, outputs named
`result_outputs/final{epoch}_s{seed}_index_{idx}.png` (kept for evaluation
compatibility, `evaluation/detector_result_gpt.py:144`).

TPU-native changes:
  * no filesystem side channel — contexts flow as arrays;
  * prompts are batched and the batch axis is shardable over a data mesh
    (replacing the reference's one-process-per-GPU + `--process_id` scheme,
    `txt2img-gpt.py:234-239`);
  * per-prompt determinism via an explicit PRNGKey(seed) (the reference
    calls `seed_everything(1)` before every prompt, `txt2img-gpt.py:304-306`,
    i.e. every prompt starts from the same noise — reproduced).
  * prompts whose layout inference fails are skipped *and logged* (the
    reference's vsr runner crashes on them, `txt2img-vsr.py:308-309`).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpaceTimeConfig
from ..ops.attention import SpatialControl
from .frontend import (
    LayoutInference,
    extract_objects,
    local_context_prompt,
    local_loss_prompt,
)
from .losses import DCLIPLoss
from .pipeline import StableDiffusion
from .spacetime import SpaceTimeInputs, optimize_prompt


def parse_gpt_prompts(path: str) -> List[str]:
    """`datasets/gpt.txt`: 4-line records, prompt = line 4i+2 minus the
    'Sentence: ' prefix (`txt2img-gpt.py:255-261`)."""
    with open(path) as f:
        rows = f.read().split("\n")[:2000]
    return [rows[4 * i + 2][10:] for i in range(len(rows) // 4)]


def parse_line_prompts(path: str) -> List[str]:
    """`datasets/mscoco.txt` / `vsr.txt`: one prompt per line."""
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]


def save_image(image01: np.ndarray, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = (np.asarray(image01) * 255.0).clip(0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


@dataclasses.dataclass
class PromptRunner:
    """Runs one prompt set through the chosen pipeline mode."""

    sd: StableDiffusion
    clip_loss: Optional[DCLIPLoss]   # required only for mode="spacetime"
    layout: LayoutInference
    clip_tokenize: Callable[[str], Sequence[int]]   # ViT-B/32 tokens (loss)
    text_tokenize: Callable[[str], Sequence[int]]   # ViT-L/14 tokens (cond)
    cfg: SpaceTimeConfig
    outdir: str = "result_outputs"
    mode: str = "spacetime"  # vanilla | spatial | spacetime
    sampler: str = "plms"    # plms | ddim | dpm — all three work in every
                             # mode (unlike the reference, SURVEY §2.1)
    save_epoch_images: bool = False  # also save final{0..epochs-2}_… per
                             # epoch (reference saves EVERY epoch's image,
                             # `plms.py:280-288`; eval filters on the last)
    _cached_uncond: Optional[jnp.ndarray] = None
    _train_step: object = None
    _optimizer: object = None
    _final_forward: object = None

    def _encode(self, texts: List[str]) -> jnp.ndarray:
        tokens = np.stack(
            [
                np.asarray(self.text_tokenize(t), np.int32)
                for t in texts
            ]
        )
        return self.sd.encode_text(jnp.array(tokens))

    def _uncond(self) -> jnp.ndarray:
        if self._cached_uncond is None:
            self._cached_uncond = self._encode([""])
        return self._cached_uncond

    def prepare_host(self, prompt: str):
        """Host-only stage: layout + tokenization (no device work).
        Returns None if layout fails, else a dict of numpy arrays + texts."""
        cfg = self.cfg
        N = cfg.max_objects
        res = self.layout(prompt)
        words, mentions = extract_objects(prompt)
        if not res or not mentions:
            return None
        mentions = mentions[:N]
        centers = np.zeros((N, 2), np.float32)
        active = np.zeros(N, np.float32)
        local_texts, obj_tokens = [], []
        for i, m in enumerate(mentions):
            centers[i] = res[m.phrase]
            active[i] = 1.0
            local_texts.append(local_context_prompt(m))
            obj_tokens.append(
                np.asarray(self.clip_tokenize(local_loss_prompt(m)), np.int32)
            )
        pad = N - len(mentions)
        local_texts += [""] * pad
        obj_tokens += [np.asarray(self.clip_tokenize(""), np.int32)] * pad
        return dict(
            centers=centers,
            active=active,
            local_texts=local_texts,
            obj_tokens=np.stack(obj_tokens),
            caption_tokens=np.asarray(self.clip_tokenize(prompt), np.int32),
            prompt=prompt,
        )

    def assemble_inputs(self, hosts, seed: int) -> SpaceTimeInputs:
        """Device stage for a CHUNK of prepare_host outputs: ONE text-encoder
        call for all captions + locals (tunnel round-trips are expensive)."""
        cfg = self.cfg
        N = cfg.max_objects
        B = len(hosts)
        texts = [h["prompt"] for h in hosts]
        for h in hosts:
            texts += h["local_texts"]
        embeds = self._encode(texts)
        cond = embeds[:B]
        locals_ = embeds[B:].reshape(B, N, embeds.shape[1], embeds.shape[2])
        lat = cfg.latent_size
        x_T = jnp.concatenate(
            [
                jax.random.normal(jax.random.PRNGKey(seed), (1, lat, lat, 4))
                for _ in range(B)
            ]
        )
        return SpaceTimeInputs(
            cond=cond,
            uncond=jnp.tile(self._uncond(), (B, 1, 1)),
            local_contexts=locals_,
            centers=jnp.array(np.stack([h["centers"] for h in hosts])),
            active=jnp.array(np.stack([h["active"] for h in hosts])),
            caption_tokens=jnp.array(np.stack([h["caption_tokens"] for h in hosts])),
            object_tokens=jnp.array(np.stack([h["obj_tokens"] for h in hosts])),
            x_T=x_T,
        )

    def build_inputs(self, prompt: str, seed: int) -> Optional[SpaceTimeInputs]:
        host = self.prepare_host(prompt)
        if host is None:
            return None
        return self.assemble_inputs([host], seed)

    def run_one(self, prompt: str, idx: int, seed: int = 1) -> Optional[np.ndarray]:
        inputs = self.build_inputs(prompt, seed)
        if inputs is None:
            print(f"[skip] no layout for prompt {idx}: {prompt!r}")
            return None
        if self.mode == "vanilla":
            eps = self.sd.make_eps_fn(
                inputs.cond, inputs.uncond, self.cfg.guidance_scale
            )
            z = self.sd.sample_from(eps, inputs.x_T, self.sampler, remat=False)
            images = self.sd.decode_latents(z)
        elif self.mode == "spatial":
            control = SpatialControl(
                inputs.local_contexts, inputs.centers,
                jnp.full_like(inputs.active, self.cfg.init_coef)
                / jnp.clip(jnp.sum(inputs.active, -1, keepdims=True), 1, None),
                inputs.active,
            )
            coef = jnp.repeat(control.coef[..., None], self.cfg.num_steps, -1)
            eps = self.sd.make_eps_fn(
                inputs.cond, inputs.uncond, self.cfg.guidance_scale, control, coef
            )
            z = self.sd.sample_from(eps, inputs.x_T, self.sampler, remat=False)
            images = self.sd.decode_latents(z)
        else:
            if self.clip_loss is None:
                raise ValueError("spacetime mode requires a DCLIPLoss (clip_loss=None)")
            if self._train_step is None:
                from .spacetime import make_final_forward, make_train_step

                self._optimizer, self._train_step = make_train_step(
                    self.sd, self.clip_loss, self.cfg, sampler=self.sampler
                )
                self._final_forward = make_final_forward(
                    self.sd, self.clip_loss, self.cfg, sampler=self.sampler
                )
            on_epoch = None
            if self.save_epoch_images:
                def on_epoch(e, imgs, _idx=idx, _seed=seed):
                    if e < self.cfg.epochs - 1:  # last epoch saved below
                        save_image(
                            np.asarray(imgs[0]),
                            os.path.join(
                                self.outdir,
                                f"final{e}_s{_seed}_index_{_idx}.png"),
                        )
            images, _, _ = optimize_prompt(
                self.sd, self.clip_loss, inputs, self.cfg, sampler=self.sampler,
                train_step=self._train_step, optimizer=self._optimizer,
                final_forward=self._final_forward, on_epoch=on_epoch,
            )
        img = np.asarray(images[0])
        save_image(
            img,
            os.path.join(
                self.outdir,
                f"final{self.cfg.epochs - 1}_s{seed}_index_{idx}.png",
            ),
        )
        return img

    def run(
        self,
        prompts: List[str],
        start: int = 0,
        end: Optional[int] = None,
        seed: int = 1,
    ) -> int:
        """Sequential shard runner (`txt2img-gpt.py:303-341`); returns the
        number of images produced."""
        done = 0
        for idx in range(start, min(end or len(prompts), len(prompts))):
            if self.run_one(prompts[idx], idx, seed) is not None:
                done += 1
        return done
