"""Layout-predictor trainer: dual param groups, Bert LR schedules, orbax
checkpointing, resume.

Reference: `trainer/Pretrain.py` — two Adam optimizers (encoder max-lr 1e-6,
bbox head 4e-5, `coco_seq2seq_v9_ablation_4.yaml:50-63`) each with a
BertScheduler; loss = Σ hinge + 0.1·GMM-NLL; checkpoints every 10 epochs and
on best validation (`Pretrain.py:101-114`), resume restores model/optimizer/
scheduler-step (`Pretrain.py:392-411`).

TPU-native shape: one jitted `train_step` (optax.multi_transform implements
the dual param groups), data-parallel over a mesh by sharding the batch
axis; metrics are plain jnp scalars.  Unlike the reference, the backward is
not wrapped in a bare try/except (`Pretrain.py:262-266`) — failures surface.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import LayoutConfig, LayoutTrainConfig
from ..models.layout.model import LayoutPredictor
from .losses import LayoutBatch, layout_total_loss
from .schedules import bert_schedule


def _param_group(path_tuple) -> str:
    names = [p.key if hasattr(p, "key") else str(p) for p in path_tuple]
    return "head" if names and names[0] == "head" else "encoder"


def make_optimizer(
    cfg: LayoutTrainConfig, params, skip_nonfinite: bool = True
) -> optax.GradientTransformation:
    enc_sched = bert_schedule(
        cfg.encoder_max_lr, 1e-8, cfg.warmup_steps, cfg.hold_steps, cfg.decay_steps
    )
    head_sched = bert_schedule(
        cfg.head_max_lr, 1e-8, cfg.warmup_steps, cfg.hold_steps, cfg.decay_steps
    )
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _param_group(path), params
    )
    opt = optax.multi_transform(
        {
            "encoder": optax.adam(enc_sched),
            "head": optax.adam(head_sched),
        },
        labels,
    )
    if cfg.grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
    if skip_nonfinite:
        # failure detection: skip (don't apply) non-finite update steps —
        # the principled version of the reference's bare
        # `try: loss.backward() except: pass` (`trainer/Pretrain.py:262-266`)
        opt = optax.apply_if_finite(opt, max_consecutive_errors=100)
    return opt


@dataclasses.dataclass
class LayoutTrainer:
    model: LayoutPredictor
    cfg: LayoutConfig
    train_cfg: LayoutTrainConfig
    optimizer: optax.GradientTransformation
    train_step: Any
    eval_step: Any

    @classmethod
    def create(cls, cfg: LayoutConfig, train_cfg: LayoutTrainConfig, params,
               mesh=None, fsdp: bool = False):
        """mesh+fsdp=True: ZeRO-style sharding of params + the dual-LR
        optimizer state over the data axis (same born-sharded scheme as
        LDMTrainer/VAETrainer); the batch shards on its leading dim."""
        model = LayoutPredictor(cfg)
        opt = make_optimizer(train_cfg, params)

        def loss_fn(params, batch: LayoutBatch):
            gmm = model.apply({"params": params}, batch.tokens, batch.object_pos)
            return layout_total_loss(
                gmm, batch,
                gmm_weight=train_cfg.gmm_loss_weight,
                margin=train_cfg.hinge_margin,
                k=cfg.gmm_components,
            )

        def train_step_fn(params, opt_state, batch: LayoutBatch):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, metrics

        if fsdp and mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel.mesh import replicated
            from ..parallel.sharding import fsdp_sharding

            p_sh = fsdp_sharding(mesh, params)
            o_sh = fsdp_sharding(mesh, jax.eval_shape(opt.init, params))
            # a rank-1 spec shards each batch leaf's leading dim and
            # replicates the rest (PartitionSpec shorter than rank)
            b_sh = NamedSharding(mesh, PartitionSpec("data"))
            rep = replicated(mesh)
            train_step = jax.jit(
                train_step_fn,
                in_shardings=(p_sh, o_sh, b_sh),
                out_shardings=(p_sh, o_sh, rep, rep),
            )
            init_opt = jax.jit(opt.init, out_shardings=o_sh)
        else:
            train_step = jax.jit(train_step_fn)
            init_opt = None

        @jax.jit
        def eval_step(params, batch: LayoutBatch):
            loss, metrics = loss_fn(params, batch)
            # mean distance of predicted (greedy) centers to GT on absolute
            # samples — the xy analogue of the reference's val mIoU
            from ..models.layout.gmm_head import sample_xy

            gmm = model.apply({"params": params}, batch.tokens, batch.object_pos)
            raw = jnp.take_along_axis(gmm, batch.abs_idx[..., None], axis=1)
            xy = sample_xy(raw, greedy_component=True)
            dist = jnp.linalg.norm(xy - batch.abs_xy, axis=-1)
            n = jnp.clip(jnp.sum(batch.abs_valid), 1.0, None)
            metrics = dict(metrics, mean_center_dist=jnp.sum(dist * batch.abs_valid) / n)
            # relation satisfaction of the GREEDY centers (margin 0): the
            # deliverable quality signal — do predicted centers actually
            # order correctly per relation (i REL j, y down)?
            xy_all = sample_xy(gmm, greedy_component=True)  # [B, L, 2]
            p1 = jnp.take_along_axis(
                xy_all, batch.rel_idx[..., 0:1].repeat(2, -1), axis=1)
            p2 = jnp.take_along_axis(
                xy_all, batch.rel_idx[..., 1:2].repeat(2, -1), axis=1)
            diffs = jnp.stack(
                [p1[..., 1] - p2[..., 1],   # above: y1 < y2
                 p2[..., 1] - p1[..., 1],   # below
                 p1[..., 0] - p2[..., 0],   # left of: x1 < x2
                 p2[..., 0] - p1[..., 0]],  # right of
                axis=-1)
            d = jnp.take_along_axis(diffs, batch.rel_type[..., None], axis=-1)[..., 0]
            nrel = jnp.clip(jnp.sum(batch.rel_valid), 1.0, None)
            metrics["rel_satisfied"] = jnp.sum((d < 0) * batch.rel_valid) / nrel
            return loss, metrics

        trainer = cls(model, cfg, train_cfg, opt, train_step, eval_step)
        trainer._init_opt = init_opt
        return trainer

    def init_state(self, params):
        if getattr(self, "_init_opt", None) is not None:
            return self._init_opt(params)  # born sharded (fsdp)
        return self.optimizer.init(params)

    # ---- checkpointing (orbax) ----
    def save_checkpoint(self, ckpt_dir: str, step: int, params, opt_state, extra=None):
        import os
        import shutil

        import orbax.checkpoint as ocp

        path = f"{ckpt_dir}/step_{step}"
        if os.path.exists(path):  # overwrite (best-val + periodic may land
            shutil.rmtree(path)   # on the same step)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                path,
                {"params": params, "opt_state": opt_state, "extra": extra or {}},
            )

    def restore_checkpoint(self, ckpt_dir: str, step: int, params, opt_state):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            target = {"params": params, "opt_state": opt_state, "extra": {}}
            restored = ckptr.restore(f"{ckpt_dir}/step_{step}", target)
        return restored["params"], restored["opt_state"]


def train_loop(
    trainer: LayoutTrainer,
    params,
    batches,
    val_batches=None,
    ckpt_dir: Optional[str] = None,
    log_every: int = 100,
    logger=None,
) -> Tuple[Any, dict]:
    """Simple epoch-free loop over an iterable of LayoutBatch."""
    opt_state = trainer.init_state(params)
    history = {"loss": []}
    for step, batch in enumerate(batches):
        params, opt_state, loss, metrics = trainer.train_step(params, opt_state, batch)
        if step % log_every == 0:
            msg = f"step {step}: loss {float(loss):.4f} " + " ".join(
                f"{k}={float(v):.4f}" for k, v in metrics.items()
            )
            (logger.info if logger else print)(msg)
        history["loss"].append(float(loss))
    if val_batches is not None:
        vals = [trainer.eval_step(params, b) for b in val_batches]
        history["val_loss"] = float(jnp.mean(jnp.stack([v[0] for v in vals])))
    if ckpt_dir:
        trainer.save_checkpoint(ckpt_dir, len(history["loss"]), params, opt_state)
    return params, history
