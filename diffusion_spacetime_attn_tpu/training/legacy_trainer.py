"""Legacy layout-trainer family: `trainer/{Trainer,RegTrainer,Finetune}.py`.

The reference keeps three pre-paper trainers alongside `PretrainTrainer`
(the live one, `training/layout_trainer.py` here):

  * `Trainer` (`Trainer.py:83-205`): discrete Rel2Layout — teacher-forced
    shifted targets, NLL(ignore pad, sum)/B on the (cats, pos, shape) head
    triple, weighted 0.4/0.3/0.3 (`Trainer.py:156-164`), two Adam optimizers
    (encoder / decoder+heads).
  * `RegTrainer` (`RegTrainer.py:94-180`): Rel2RegLayout — NLL cats /B +
    λ·RegLoss(mean) on the sigmoid boxes (`RegTrainer.py:150-156`).
  * `FinetuneTrainer` (`Finetune.py:77-141`): masked-LM heads —
    (NLL vocab + NLL token_type) / (2B) (`Finetune.py:110-114`).

TPU shape: each trainer is ONE jitted train_step (loss + grads + both
optax updates fused into a single XLA program); the two torch optimizers
become one `optax.multi_transform` over an encoder/decoder param partition,
matching per-group LRs.  Losses come from `training/legacy_losses.py`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.layout.legacy import (
    LegacyConfig,
    Rel2Layout,
    Rel2RegLayout,
    Text2Layout,
)
from .legacy_losses import nll_loss, reg_loss

PAD = 0


@dataclasses.dataclass(frozen=True)
class LegacyTrainConfig:
    """`configs/default.yaml` SOLVER block as the legacy trainers read it
    (encoder/decoder LRs; `Trainer.py:34-44`)."""

    encoder_lr: float = 1e-4
    decoder_lr: float = 1e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.0
    reg_box_weight: float = 1.0      # λ (`RegTrainer.py:41` self.l)


class LegacyTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _group_of(path) -> str:
    name = path[0].key if hasattr(path[0], "key") else str(path[0])
    return "encoder" if name in ("encoder", "text_encoder") else "decoder"


def _make_optimizer(cfg: LegacyTrainConfig):
    tx = {
        "encoder": optax.adamw(cfg.encoder_lr, b1=cfg.betas[0],
                               b2=cfg.betas[1],
                               weight_decay=cfg.weight_decay),
        "decoder": optax.adamw(cfg.decoder_lr, b1=cfg.betas[0],
                               b2=cfg.betas[1],
                               weight_decay=cfg.weight_decay),
    }
    def labeler(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _group_of(path), params)
    return optax.multi_transform(tx, labeler)


class LegacyDiscreteTrainer:
    """`Trainer.py` for Rel2Layout."""

    def __init__(self, model_cfg: LegacyConfig,
                 cfg: LegacyTrainConfig = LegacyTrainConfig()):
        self.model = Rel2Layout(model_cfg)
        self.cfg = cfg
        self.tx = _make_optimizer(cfg)

        def loss_fn(params, batch):
            # teacher forcing: inputs [:, :-1], targets [:, 1:]
            # (`Trainer.py:107-115`)
            out_c, out_p, out_s = self.model.apply(
                {"params": params},
                batch["tokens"], batch["obj_ids"], batch["segments"],
                batch["token_types"], batch["tokens"] != PAD,
                batch["cats"][:, :-1], batch["pos"][:, :-1],
                batch["shapes"][:, :-1],
            )
            B = batch["cats"].shape[0]
            flat = lambda t: t.reshape(-1, t.shape[-1])
            lp = lambda t: jax.nn.log_softmax(flat(t), axis=-1)
            c_loss = nll_loss(lp(out_c), batch["cats"][:, 1:].reshape(-1), PAD) / B
            p_loss = nll_loss(lp(out_p), batch["pos"][:, 1:].reshape(-1), PAD) / B
            s_loss = nll_loss(lp(out_s), batch["shapes"][:, 1:].reshape(-1), PAD) / B
            loss = 0.4 * c_loss + 0.3 * p_loss + 0.3 * s_loss  # Trainer.py:164
            return loss, dict(loss=loss, cat_loss=c_loss, pos_loss=p_loss,
                              shape_loss=s_loss)

        def step(state: LegacyTrainState, batch):
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return LegacyTrainState(params, opt_state, state.step + 1), metrics

        self.train_step = jax.jit(step)
        self._loss_fn = loss_fn

    def init_state(self, rng, batch) -> LegacyTrainState:
        params = self.model.init(
            rng, batch["tokens"], batch["obj_ids"], batch["segments"],
            batch["token_types"], batch["tokens"] != PAD,
            batch["cats"][:, :-1], batch["pos"][:, :-1],
            batch["shapes"][:, :-1],
        )["params"]
        return LegacyTrainState(params, self.tx.init(params),
                                jnp.zeros((), jnp.int32))


class LegacyRegTrainer:
    """`RegTrainer.py` for Rel2RegLayout."""

    def __init__(self, model_cfg: LegacyConfig,
                 cfg: LegacyTrainConfig = LegacyTrainConfig()):
        self.model = Rel2RegLayout(model_cfg)
        self.cfg = cfg
        self.tx = _make_optimizer(cfg)
        lam = cfg.reg_box_weight

        def loss_fn(params, batch):
            out_c, out_box = self.model.apply(
                {"params": params},
                batch["tokens"], batch["obj_ids"], batch["segments"],
                batch["token_types"], batch["tokens"] != PAD,
                batch["cats"][:, :-1], batch["boxes"][:, :-1],
            )
            B = batch["cats"].shape[0]
            lp = jax.nn.log_softmax(out_c.reshape(-1, out_c.shape[-1]), axis=-1)
            c_loss = nll_loss(lp, batch["cats"][:, 1:].reshape(-1), PAD) / B
            b_loss = reg_loss(out_box.reshape(-1, 4),
                              batch["boxes"][:, 1:].reshape(-1, 4),
                              pretrain=False, reduction="mean")
            loss = c_loss + lam * b_loss  # RegTrainer.py:156
            return loss, dict(loss=loss, cat_loss=c_loss, box_loss=lam * b_loss)

        def step(state: LegacyTrainState, batch):
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return LegacyTrainState(params, opt_state, state.step + 1), metrics

        self.train_step = jax.jit(step)
        self._loss_fn = loss_fn

    def init_state(self, rng, batch) -> LegacyTrainState:
        params = self.model.init(
            rng, batch["tokens"], batch["obj_ids"], batch["segments"],
            batch["token_types"], batch["tokens"] != PAD,
            batch["cats"][:, :-1], batch["boxes"][:, :-1],
        )["params"]
        return LegacyTrainState(params, self.tx.init(params),
                                jnp.zeros((), jnp.int32))


class LegacyFinetuneTrainer:
    """`Finetune.py`: masked-LM pretraining of the legacy encoder — vocab +
    token-type heads over `legacy_data.mask_relation_sentence` batches,
    loss = (NLL_vocab + NLL_type) / (2B) (`Finetune.py:110-114`).

    Drives the RelEncoder's classifier heads directly (the reference model
    there is the encoder wrapped with two heads)."""

    def __init__(self, model_cfg: LegacyConfig,
                 cfg: LegacyTrainConfig = LegacyTrainConfig()):
        import flax.linen as nn

        from ..models.layout.legacy import RelEncoder

        class _MLMModel(nn.Module):
            mcfg: LegacyConfig

            @nn.compact
            def __call__(self, tokens, obj_ids, segments, token_types,
                         pad_mask):
                memory, *_ = RelEncoder(self.mcfg, name="encoder")(
                    tokens, obj_ids, segments, token_types, pad_mask)
                vocab = nn.Dense(self.mcfg.vocab_size, name="vocab_head")(memory)
                ttype = nn.Dense(4, name="type_head")(memory)
                return vocab, ttype

        self.model = _MLMModel(model_cfg)
        self.cfg = cfg
        self.tx = _make_optimizer(cfg)

        def loss_fn(params, batch):
            vocab, ttype = self.model.apply(
                {"params": params},
                batch["tokens"], batch["obj_ids"], batch["segments"],
                batch["token_types"], batch["tokens"] != PAD,
            )
            B = batch["tokens"].shape[0]
            lpv = jax.nn.log_softmax(vocab.reshape(-1, vocab.shape[-1]), -1)
            lpt = jax.nn.log_softmax(ttype.reshape(-1, ttype.shape[-1]), -1)
            v_loss = nll_loss(lpv, batch["labels"].reshape(-1), PAD)
            t_loss = nll_loss(lpt, batch["type_labels"].reshape(-1), PAD)
            loss = (v_loss + t_loss) / (2 * B)
            return loss, dict(loss=loss, vocab_loss=v_loss, type_loss=t_loss)

        def step(state: LegacyTrainState, batch):
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return LegacyTrainState(params, opt_state, state.step + 1), metrics

        self.train_step = jax.jit(step)
        self._loss_fn = loss_fn

    def init_state(self, rng, batch) -> LegacyTrainState:
        params = self.model.init(
            rng, batch["tokens"], batch["obj_ids"], batch["segments"],
            batch["token_types"], batch["tokens"] != PAD,
        )["params"]
        return LegacyTrainState(params, self.tx.init(params),
                                jnp.zeros((), jnp.int32))
