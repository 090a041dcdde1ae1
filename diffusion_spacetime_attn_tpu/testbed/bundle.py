"""Save/load of trained testbed checkpoints + the assembled model bundle.

One directory holds the three trained parameter trees (msgpack via
flax.serialization — a single committed file per model, no orbax directory
fan-out) plus a meta.json with the VAE's measured latent scale factor and
the training provenance.  `load_bundle` reassembles the exact objects the
full method code consumes: a `pipeline.StableDiffusion` (whose conditioning
text tower IS the trained CLIP's text tower — at testbed scale one
dual-tower model plays both the reference's ViT-L/14-text conditioning role
and its ViT-B/32 DCLIP-judge role) and a `pipeline.losses.DCLIPLoss`.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..pipeline.losses import DCLIPLoss
from ..pipeline.pipeline import StableDiffusion
from .configs import testbed_clip_cfg, testbed_pipeline_cfg


def _save_tree(path: str, tree: Any) -> None:
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, tree)))


def _load_tree(path: str) -> Any:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_bundle(ckpt_dir: str, *, vae_params=None, clip_params=None,
                unet_params=None, meta: Optional[Dict] = None) -> None:
    """Write any subset of the three models (staged training saves as it
    goes) and merge `meta` into meta.json."""
    os.makedirs(ckpt_dir, exist_ok=True)
    for name, tree in (("vae", vae_params), ("clip", clip_params),
                       ("unet", unet_params)):
        if tree is not None:
            _save_tree(os.path.join(ckpt_dir, f"{name}.msgpack"), tree)
    meta_path = os.path.join(ckpt_dir, "meta.json")
    merged = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            merged = json.load(f)
    merged.update(meta or {})
    with open(meta_path, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)


@dataclasses.dataclass
class TestbedBundle:
    sd: StableDiffusion
    clip_loss: DCLIPLoss
    clip_params: Any
    meta: Dict

    def encode_captions(self, captions, tokenize=None):
        """captions: list[str] → [B, L, D] conditioning embeddings."""
        import jax.numpy as jnp

        from .scenes import tokenize as _tok

        tok = tokenize or _tok
        ids = jnp.asarray(np.stack([tok(c) for c in captions]))
        return self.sd.encode_text(ids)


def load_bundle(ckpt_dir: str, num_steps: int = 50,
                guidance_scale: Optional[float] = None) -> TestbedBundle:
    from ..models.clip import CLIP

    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    if guidance_scale is None:
        guidance_scale = float(meta.get("guidance_scale", 7.5))
    cfg = testbed_pipeline_cfg(
        scale_factor=float(meta["scale_factor"]),
        num_steps=num_steps, guidance_scale=guidance_scale,
    )
    sd = StableDiffusion.create(cfg, jax.random.PRNGKey(0), abstract=True)
    vae_params = _load_tree(os.path.join(ckpt_dir, "vae.msgpack"))
    clip_params = _load_tree(os.path.join(ckpt_dir, "clip.msgpack"))
    unet_params = _load_tree(os.path.join(ckpt_dir, "unet.msgpack"))
    sd = dataclasses.replace(
        sd, vae_params=vae_params, unet_params=unet_params,
        text_params=clip_params["text"],
    )
    clip = CLIP(testbed_clip_cfg())
    # the reference feeds [0,1] images to CLIP unnormalized (losses.py
    # module docstring); the testbed CLIP is TRAINED that way too
    clip_loss = DCLIPLoss(clip, clip_params, normalize=False)
    return TestbedBundle(sd=sd, clip_loss=clip_loss, clip_params=clip_params,
                         meta=meta)
