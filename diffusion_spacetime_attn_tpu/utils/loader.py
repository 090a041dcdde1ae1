"""High-level checkpoint loading: CompVis sd-v1-4.ckpt → StableDiffusion
bundle; fairseq/HF checkpoints → layout predictor; OpenAI ViT-B/32 → DCLIP.

Mirrors `load_model_from_config` (`scripts/txt2img-gpt.py:55-72`), which
loads the single CompVis checkpoint with strict=False.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from ..config import LayoutConfig, PipelineConfig
from ..pipeline.pipeline import StableDiffusion
from . import convert
from .testing import randomize_params


def load_stable_diffusion(
    cfg: PipelineConfig,
    ckpt_path: Optional[str] = None,
    rng: Optional[jax.Array] = None,
    randomize_if_missing: bool = True,
) -> StableDiffusion:
    """ckpt_path: CompVis .ckpt/.safetensors containing
    model.diffusion_model.* / first_stage_model.* / cond_stage_model.*.
    Without a path, params are random (bench/test mode)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    sd = StableDiffusion.create(cfg, rng, abstract=True)
    if ckpt_path:
        state = convert.load_torch_checkpoint(ckpt_path)
        unet_params = convert.convert_sd_unet(
            state,
            channel_mult=cfg.unet.channel_mult,
            num_res_blocks=cfg.unet.num_res_blocks,
            attention_ds=cfg.unet.attention_resolutions,
        )
        vae_params = convert.convert_sd_vae(
            state, ch_mult=cfg.vae.ch_mult, num_res_blocks=cfg.vae.num_res_blocks
        )
        text_params = convert.convert_hf_clip_text(
            state, prefix="cond_stage_model.transformer.text_model."
        )
        return dataclasses.replace(
            sd,
            unet_params=jax.device_put(unet_params),
            vae_params=jax.device_put(vae_params),
            text_params=jax.device_put(text_params),
        )
    if randomize_if_missing:
        # ON-DEVICE generation (not host randomize_params): host numpy
        # leaves are re-transferred through the tunnel on EVERY jitted call
        # — measured ~330 s/prompt in the spacetime sweep vs seconds with
        # committed device arrays.
        from .testing import randomize_params_on_device

        r1, r2, r3 = jax.random.split(rng, 3)
        return dataclasses.replace(
            sd,
            unet_params=randomize_params_on_device(sd.unet_params, r1),
            vae_params=randomize_params_on_device(sd.vae_params, r2),
            text_params=randomize_params_on_device(sd.text_params, r3),
        )
    return sd


def cast_params(tree, dtype):
    """Cast every floating leaf to `dtype` (int/bool leaves untouched).

    bf16 params halve parameter HBM (~1.7 GB for SD v1) — the shipped fix
    for full-method serving's f32-params ResourceExhausted edge
    (docs/SERVING.md).  Compute dtype is governed separately by each
    module's config; norms/softmax still run f32 internally."""
    import jax
    import jax.numpy as jnp

    d = jnp.dtype(dtype)
    return jax.tree_util.tree_map(
        lambda x: x.astype(d) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _is_loadable_run_dir(path: str) -> bool:
    """True when `path` is a train_layout.py run dir whose PARAMS actually
    exist.  best.json + config.json are committed metadata but the orbax
    params dir is gitignored (241 MB) — on a fresh checkout best.json is
    present with nothing to load, and defaulting to it would crash every
    CLI at startup instead of falling back to random weights."""
    import json
    import os

    best = os.path.join(path, "best.json")
    if not os.path.isfile(best):
        return False
    try:
        with open(best) as f:
            params_rel = json.load(f).get("params_path", "best_params")
    except (OSError, ValueError):
        return False
    return os.path.exists(os.path.join(path, params_rel))


def find_default_layout_checkpoint() -> Optional[str]:
    """Locate a TRAINED layout checkpoint dir (one holding best.json AND
    its params): $DSTA_LAYOUT_CKPT if set, else the repo-level
    `saved/layout_gpt3/`.  Returns None when absent — callers fall back to
    random weights (bench/test mode).  An explicitly-set DSTA_LAYOUT_CKPT
    that is not loadable raises rather than silently substituting another
    checkpoint's numbers."""
    import os

    env = os.environ.get("DSTA_LAYOUT_CKPT")
    if env:
        if not _is_loadable_run_dir(env):
            raise FileNotFoundError(
                f"DSTA_LAYOUT_CKPT={env} is not a loadable train_layout.py "
                "run dir (best.json + its params_path must exist)")
        return env
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    default = os.path.join(repo_root, "saved", "layout_gpt3")
    return default if _is_loadable_run_dir(default) else None


def load_layout_predictor(
    cfg: LayoutConfig,
    ckpt_path: Optional[str] = None,
    rng: Optional[jax.Array] = None,
):
    """ckpt_path: a train_layout.py checkpoint dir (holding best.json +
    config.json — the stored config REBUILDS the trained architecture,
    overriding `cfg`), a bare orbax params dir, the reference's fairseq
    Rel2Bbox .pth (`checkpoint_90_0.0.pth` naming, full model incl. GMM
    head — `inference_coco.py:467-477`), or a torch .pth with HF RoBERTa
    keys for the backbone only (head randomly initialized)."""
    import json
    import os

    from ..models.layout.model import create_layout_predictor

    rng = jax.random.PRNGKey(0) if rng is None else rng
    if ckpt_path and os.path.isfile(os.path.join(ckpt_path, "best.json")):
        # trained-run dir: resolve params path + rebuild the exact config
        with open(os.path.join(ckpt_path, "best.json")) as f:
            best = json.load(f)
        cfg_file = os.path.join(ckpt_path, "config.json")
        if os.path.isfile(cfg_file):
            with open(cfg_file) as f:
                cfg = LayoutConfig(**json.load(f)["layout"])
        ckpt_path = os.path.join(ckpt_path, best.get("params_path", "best_params"))
    model, params = create_layout_predictor(cfg, rng)
    if ckpt_path:
        if ckpt_path.endswith((".pth", ".pt", ".ckpt", ".safetensors")):
            state = convert.load_torch_checkpoint(ckpt_path)
            if any("sentence_encoder." in k for k in state):
                params = convert.convert_fairseq_rel2bbox(state)
            else:
                backbone = convert.convert_hf_roberta(state, prefix="roberta.")
                params = dict(params)
                params["backbone"] = {**params["backbone"], **backbone}
        else:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                params = ckptr.restore(os.path.abspath(ckpt_path), params)
    return model, params
