"""Contrastive (InfoNCE) training for the dual-tower CLIP model.

The reference consumes OpenAI's pretrained ViT-B/32 (`plms.py:24`,
`clip.load`) — it never trains CLIP.  The framework still needs a CLIP
trainer for environments without the pretrained blobs (the closed-loop
testbed trains a tiny CLIP from scratch as the fidelity judge), so this
implements the standard CLIP objective (Radford et al. 2021, eq. in
Fig. 3): symmetric cross-entropy over cosine-similarity logits with a
learnable temperature, exactly the objective the consumed checkpoint was
produced by.

One addition over the vanilla recipe: **duplicate-caption masking**.  With
a small caption vocabulary (the testbed has ~540 distinct captions),
in-batch duplicates are false negatives that cap the achievable accuracy;
logits between distinct rows with IDENTICAL token sequences are masked out
of both softmaxes (the diagonal stays).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.clip import CLIP


class CLIPTrainState(NamedTuple):
    params: Any
    logit_scale: jnp.ndarray   # scalar, log of the temperature inverse
    opt_state: Any
    step: jnp.ndarray


def clip_contrastive_loss(img_feat: jnp.ndarray, txt_feat: jnp.ndarray,
                          logit_scale: jnp.ndarray,
                          tokens: jnp.ndarray) -> Tuple[jnp.ndarray, dict]:
    """Symmetric InfoNCE with duplicate-caption masking.

    img_feat/txt_feat: [B, D] (unnormalized); tokens: [B, L] int32 used only
    to detect duplicate captions.
    """
    img = img_feat / jnp.clip(
        jnp.linalg.norm(img_feat, axis=-1, keepdims=True), 1e-8)
    txt = txt_feat / jnp.clip(
        jnp.linalg.norm(txt_feat, axis=-1, keepdims=True), 1e-8)
    scale = jnp.exp(jnp.clip(logit_scale, None, np.log(100.0)))
    logits = scale * img @ txt.T                       # [B, B]
    B = logits.shape[0]
    same = jnp.all(tokens[:, None, :] == tokens[None, :, :], axis=-1)
    off_diag_dup = same & ~jnp.eye(B, dtype=bool)
    logits = jnp.where(off_diag_dup, -jnp.inf, logits)
    labels = jnp.arange(B)
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = 0.5 * (jnp.mean(li) + jnp.mean(lt))
    acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return loss, {"loss": loss, "acc_i2t": acc, "scale": scale}


def make_clip_train_step(clip: CLIP, lr: float = 1e-3,
                         weight_decay: float = 0.05):
    """→ (init_fn(params) -> state, step_fn(state, images, tokens) ->
    (state, metrics)).  images: model-input pixels [B, H, W, 3]."""
    opt = optax.adamw(lr, weight_decay=weight_decay)

    def init_fn(params) -> CLIPTrainState:
        trainable = (params, jnp.asarray(np.log(1.0 / 0.07), jnp.float32))
        return CLIPTrainState(
            params=trainable[0],
            logit_scale=trainable[1],
            opt_state=opt.init(trainable),
            step=jnp.zeros((), jnp.int32),
        )

    def step_fn(state: CLIPTrainState, images, tokens):
        def loss_fn(trainable):
            params, logit_scale = trainable
            img_feat, txt_feat = clip.apply({"params": params}, images, tokens)
            return clip_contrastive_loss(img_feat, txt_feat, logit_scale, tokens)

        trainable = (state.params, state.logit_scale)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        updates, opt_state = opt.update(grads, state.opt_state, trainable)
        params, logit_scale = optax.apply_updates(trainable, updates)
        return CLIPTrainState(params, logit_scale, opt_state,
                              state.step + 1), metrics

    return init_fn, step_fn


def retrieval_accuracy(clip: CLIP, params, images, tokens,
                       batch: int = 256) -> float:
    """Held-out zero-shot check: fraction of images whose nearest caption
    (over the UNIQUE captions present) is their own."""
    uniq, inverse = np.unique(np.asarray(tokens), axis=0, return_inverse=True)
    encode_i = jax.jit(lambda p, x: clip.apply({"params": p}, x,
                                               method=CLIP.encode_image))
    encode_t = jax.jit(lambda p, t: clip.apply({"params": p}, t,
                                               method=CLIP.encode_text))
    tf = np.array(encode_t(params, jnp.asarray(uniq)))
    tf /= np.clip(np.linalg.norm(tf, axis=-1, keepdims=True), 1e-8, None)
    hits = 0
    for i in range(0, len(images), batch):
        feats = np.array(encode_i(params, jnp.asarray(images[i:i + batch])))
        feats /= np.clip(np.linalg.norm(feats, axis=-1, keepdims=True), 1e-8, None)
        hits += int(np.sum(np.argmax(feats @ tf.T, axis=-1)
                           == inverse[i:i + batch]))
    return hits / len(images)
