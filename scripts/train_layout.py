#!/usr/bin/env python
"""Layout-predictor training CLI (reference: `layout_predictor/
LayoutTransformer/train.py` + `trainer/Pretrain.py`)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--gpt3-pkl",
        default="/root/reference/layout_predictor/LayoutTransformer/data/gpt-3.pkl",
    )
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--ckpt-dir", default="saved/layout")
    ap.add_argument("--resume-step", type=int, default=None)
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--merges", default=None)
    ap.add_argument("--val-split", type=float, default=0.1)
    ap.add_argument("--layers", type=int, default=None,
                    help="encoder depth (default LayoutConfig; the reference "
                         "config DECLARES 4 — coco_seq2seq_v9_ablation_4.yaml "
                         "NUM_LAYERS — though its pickled fairseq args load "
                         "12 pretrained layers)")
    ap.add_argument("--heads", type=int, default=None)
    ap.add_argument("--encoder-lr", type=float, default=None,
                    help="encoder max LR (reference 1e-6 assumes a PRETRAINED "
                         "RoBERTa; training from scratch needs ~1e-4)")
    ap.add_argument("--head-lr", type=float, default=None)
    ap.add_argument("--warmup", type=int, default=None)
    ap.add_argument("--hold", type=int, default=None)
    ap.add_argument("--decay", type=int, default=None)
    ap.add_argument("--abs-stats", default="default",
                    help="sample relation-consistent absolute anchors from "
                         "COCO stats (sta_dict.json) for relation-only "
                         "examples — substitute for the reference's missing "
                         "COCO absolute half; 'none' disables")
    ap.add_argument("--fsdp", action="store_true",
                    help="shard params + dual-LR optimizer state over the "
                         "data axis (ZeRO-style; multi-device only)")
    ap.add_argument("--augment-templates", type=int, default=0,
                    help="N template paraphrases per supervised relation "
                         "added to the TRAIN split (plain copula phrasings; "
                         "datasets.augment_with_templates)")
    ap.add_argument("--margin", type=float, default=None,
                    help="hinge margin (default cfg 0.2)")
    ap.add_argument("--gmm-weight", type=float, default=None,
                    help="GMM-NLL loss weight (default cfg 0.1)")
    ap.add_argument("--transitive-closure", action="store_true",
                    help="append transitively inferred relation triples "
                         "(datasets.close_relations_transitively) before "
                         "anchor sampling — targets chained-relation "
                         "failures in the gpt consistency protocol")
    ap.add_argument("--grad-clip", type=float, default=None,
                    help="global grad-norm clip (default off)")
    ap.add_argument("--select-metric", choices=["val_loss", "rel_satisfied"],
                    default="val_loss",
                    help="best-checkpoint criterion: val_loss = reference "
                         "parity (Pretrain.py:101-114); rel_satisfied "
                         "targets the deployed relation-consistency "
                         "protocol (val_loss tiebreak)")
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--synthetic", action="store_true", help="use synthetic corpus")
    ap.add_argument("--cpu", action="store_true", help="force host CPU")
    ap.add_argument("--save-best-every", type=int, default=25,
                    help="epochs between best-params disk flushes (the best "
                         "tree is tracked on device; also flushed at end)")
    ap.add_argument("--ckpt-every", type=int, default=50,
                    help="epochs between full (params+opt) resume checkpoints")
    ap.add_argument("--limit", type=int, default=None,
                    help="cap example count (smoke runs)")
    ap.add_argument("--coco-instances", default=None,
                    help="COCO instances JSON (adds absolute-target half)")
    ap.add_argument("--vg-instances", default=None,
                    help="VG-MSDN instances json (train on Visual-Genome "
                         "scene graphs, reference DATASETS.NAME=vg_msdn)")
    ap.add_argument("--coco-captions", default=None,
                    help="COCO captions JSON")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from diffusion_spacetime_attn_tpu.config import LayoutConfig, LayoutTrainConfig
    from diffusion_spacetime_attn_tpu.models.layout.model import (
        create_layout_predictor,
    )
    from diffusion_spacetime_attn_tpu.training.datasets import (
        batches,
        load_gpt3_examples,
        synthetic_examples,
    )
    from diffusion_spacetime_attn_tpu.training.layout_trainer import LayoutTrainer
    from diffusion_spacetime_attn_tpu.utils.profiling import JsonLogger, get_logger
    from diffusion_spacetime_attn_tpu.utils.tokenizer import make_roberta_tokenizer

    logger = get_logger("train_layout")
    rng = np.random.RandomState(0)
    sta = None  # resolved sta_dict path once anchors are attached
    if args.synthetic:
        examples = synthetic_examples(512, rng)
    elif args.vg_instances:
        from diffusion_spacetime_attn_tpu.training.datasets import (
            load_vg_msdn_examples,
        )

        examples = load_vg_msdn_examples(args.vg_instances)
        print(f"loaded {len(examples)} VG-MSDN scene-graph examples")
    else:
        examples = load_gpt3_examples(args.gpt3_pkl)
        if args.transitive_closure:
            from diffusion_spacetime_attn_tpu.training.datasets import (
                close_relations_transitively,
            )

            before = sum(len(e.relations) for e in examples)
            examples = close_relations_transitively(examples)
            added = sum(len(e.relations) for e in examples) - before
            logger.info(f"transitive closure: +{added} inferred relation "
                        "triples")
        if args.abs_stats != "none":
            from diffusion_spacetime_attn_tpu.training.datasets import (
                COCO_STA_DEFAULT,
            )

            cand = (COCO_STA_DEFAULT if args.abs_stats == "default"
                    else args.abs_stats)
            if os.path.exists(cand):
                from diffusion_spacetime_attn_tpu.training.datasets import (
                    attach_sampled_abs_targets,
                )

                sta = cand
                examples = attach_sampled_abs_targets(
                    examples, sta, np.random.RandomState(1))
                print(f"attached sampled absolute anchors from {sta}")
        if args.coco_instances and args.coco_captions:
            from diffusion_spacetime_attn_tpu.training.datasets import (
                load_coco_caption_examples,
            )

            coco = load_coco_caption_examples(
                args.coco_instances, args.coco_captions,
                max_images=len(examples),
            )
            logger_msg = f"added {len(coco)} COCO absolute-target examples"
            print(logger_msg)
            examples = examples + coco
    if args.limit:
        examples = examples[: args.limit]
    n_val = int(len(examples) * args.val_split)
    val, train = examples[:n_val], examples[n_val:]
    if args.augment_templates:
        from diffusion_spacetime_attn_tpu.training.datasets import (
            augment_with_templates,
        )

        aug = augment_with_templates(
            train, np.random.RandomState(2), variants=args.augment_templates)
        if sta:
            # hinge-only augmented rows dilute the GMM-NLL supervision and
            # the shared head diverges to NaN within epochs (measured
            # 2026-08-19: nll 240→1150→nan in 6 epochs at the gpt3 recipe)
            # — give them the same relation-repaired sampled anchors
            from diffusion_spacetime_attn_tpu.training.datasets import (
                attach_sampled_abs_targets,
            )

            aug = attach_sampled_abs_targets(
                aug, sta, np.random.RandomState(3))
        train = train + aug
        logger.info(f"template augmentation: +{len(aug)} examples "
                    f"({args.augment_templates} variants/relation)")
    logger.info(f"{len(train)} train / {len(val)} val examples")

    import dataclasses as dc

    cfg = LayoutConfig()
    if args.layers is not None:
        cfg = dc.replace(cfg, layers=args.layers)
    if args.heads is not None:
        cfg = dc.replace(cfg, heads=args.heads)
    train_cfg = LayoutTrainConfig(batch_size=args.batch_size, epochs=args.epochs)
    overrides = {}
    for name, ov in (("encoder_max_lr", args.encoder_lr),
                     ("head_max_lr", args.head_lr),
                     ("warmup_steps", args.warmup),
                     ("hold_steps", args.hold),
                     ("decay_steps", args.decay),
                     ("hinge_margin", args.margin),
                     ("gmm_loss_weight", args.gmm_weight),
                     ("grad_clip_norm", args.grad_clip)):
        if ov is not None:
            overrides[name] = ov
    if overrides:
        train_cfg = dc.replace(train_cfg, **overrides)
    model, params = create_layout_predictor(cfg, jax.random.PRNGKey(0))
    if args.fsdp and len(jax.devices()) > 1:
        from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh

        trainer = LayoutTrainer.create(
            cfg, train_cfg, params,
            mesh=make_mesh(data=len(jax.devices())), fsdp=True)
    else:
        trainer = LayoutTrainer.create(cfg, train_cfg, params)
    opt_state = trainer.init_state(params)
    tok = make_roberta_tokenizer(args.vocab, args.merges)

    if args.resume_step is not None:
        params, opt_state = trainer.restore_checkpoint(
            os.path.abspath(args.ckpt_dir), args.resume_step, params, opt_state
        )
        logger.info(f"resumed from step {args.resume_step}")

    os.makedirs(args.ckpt_dir, exist_ok=True)
    jlog = JsonLogger(os.path.join(args.ckpt_dir, "train_log.jsonl"))
    # persist the model/train config beside the checkpoints so inference can
    # rebuild the exact architecture (utils.loader reads this)
    import json

    with open(os.path.join(args.ckpt_dir, "config.json"), "w") as f:
        json.dump({"layout": dc.asdict(cfg), "train": dc.asdict(train_cfg)},
                  f, indent=1)

    def save_best_params(params, step, epoch, vmean, vmetrics):
        """Params-only orbax checkpoint + best.json pointer (what
        utils.loader.load_layout_predictor consumes)."""
        import shutil

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(args.ckpt_dir, "best_params"))
        if os.path.exists(path):
            shutil.rmtree(path)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, jax.tree_util.tree_map(np.asarray, params))
        with open(os.path.join(args.ckpt_dir, "best.json"), "w") as f:
            json.dump({"step": step, "epoch": epoch, "val_loss": vmean,
                       "params_path": "best_params",
                       "select_metric": args.select_metric,
                       "val_metrics": vmetrics}, f, indent=1)

    step = args.resume_step or 0
    def selection_score(vmean, vmetrics):
        """Lower is better.  `val_loss` is the reference's criterion
        (`Pretrain.py:101-114`); `rel_satisfied` targets the deployed
        protocol metric (docs/EVALUATION.md layout relation consistency)
        with val_loss as the tiebreak so degenerate high-NLL epochs with
        equal satisfaction don't win."""
        if args.select_metric == "rel_satisfied":
            return (-vmetrics.get("rel_satisfied", 0.0), vmean)
        return (vmean,)

    best_val = (float("inf"),)
    # best params tracked as an ON-DEVICE copy (a host device_get of the
    # full tree per improving epoch would dominate wall time over the
    # tunnel); flushed to disk every --save-best-every epochs + at the end
    best_snapshot = None  # (params_copy, step, epoch, vmean, vmetrics)
    best_dirty = False
    copy_tree = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))

    def flush_best():
        nonlocal best_dirty
        if best_snapshot is not None and best_dirty:
            save_best_params(*best_snapshot)
            best_dirty = False

    for epoch in range(args.epochs):
        for batch in batches(train, tok, args.batch_size, rng, max_len=cfg.max_len):
            params, opt_state, loss, metrics = trainer.train_step(
                params, opt_state, batch
            )
            if step % args.log_every == 0:
                logger.info(
                    f"epoch {epoch} step {step}: loss {float(loss):.4f} "
                    + " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
                )
                jlog.log("train", epoch=epoch, step=step, loss=float(loss))
            step += 1
        # validation
        if val:
            vlosses, vmetrics = [], {}
            for batch in batches(val, tok, args.batch_size, rng, max_len=cfg.max_len,
                                 drop_last=False):
                vl, vm = trainer.eval_step(params, batch)
                vlosses.append(float(vl))
                for k, v in vm.items():
                    vmetrics.setdefault(k, []).append(float(v))
            vmean = float(np.mean(vlosses))
            vmetrics = {k: float(np.mean(v)) for k, v in vmetrics.items()}
            logger.info(f"epoch {epoch}: val_loss {vmean:.4f} "
                        + " ".join(f"{k}={v:.4f}" for k, v in vmetrics.items()))
            jlog.log("val", epoch=epoch, val_loss=vmean, **vmetrics)
            score = selection_score(vmean, vmetrics)
            if score < best_val:
                best_val = score
                best_snapshot = (copy_tree(params), step, epoch, vmean, vmetrics)
                best_dirty = True
        if epoch and epoch % args.save_best_every == 0:
            flush_best()
        if epoch and epoch % args.ckpt_every == 0:
            trainer.save_checkpoint(
                os.path.abspath(args.ckpt_dir), step, params, opt_state,
                extra={"epoch": epoch},
            )
    flush_best()
    trainer.save_checkpoint(
        os.path.abspath(args.ckpt_dir), step, params, opt_state,
        extra={"epoch": args.epochs - 1, "final": True},
    )
    logger.info(f"training complete; best {args.select_metric} score "
                f"{best_val} (epoch {best_snapshot[2] if best_snapshot else -1})")


if __name__ == "__main__":
    main()
