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
    ap.add_argument("--fsdp", action="store_true",
                    help="shard params + dual-LR optimizer state over the "
                         "data axis (ZeRO-style; multi-device only)")
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--synthetic", action="store_true", help="use synthetic corpus")
    ap.add_argument("--coco-instances", default=None,
                    help="COCO instances JSON (adds absolute-target half)")
    ap.add_argument("--vg-instances", default=None,
                    help="VG-MSDN instances json (train on Visual-Genome "
                         "scene graphs, reference DATASETS.NAME=vg_msdn)")
    ap.add_argument("--coco-captions", default=None,
                    help="COCO captions JSON")
    args = ap.parse_args()

    import jax
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
    n_val = int(len(examples) * args.val_split)
    val, train = examples[:n_val], examples[n_val:]
    logger.info(f"{len(train)} train / {len(val)} val examples")

    cfg = LayoutConfig()
    train_cfg = LayoutTrainConfig(batch_size=args.batch_size, epochs=args.epochs)
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

    jlog = JsonLogger(os.path.join(args.ckpt_dir, "train_log.jsonl")
                      if os.path.isdir(args.ckpt_dir) or not os.path.exists(args.ckpt_dir)
                      else None)
    os.makedirs(args.ckpt_dir, exist_ok=True)

    step = args.resume_step or 0
    best_val = float("inf")
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
            vlosses = []
            for batch in batches(val, tok, args.batch_size, rng, max_len=cfg.max_len,
                                 drop_last=False):
                vl, vm = trainer.eval_step(params, batch)
                vlosses.append(float(vl))
            vmean = float(np.mean(vlosses))
            logger.info(f"epoch {epoch}: val_loss {vmean:.4f}")
            jlog.log("val", epoch=epoch, val_loss=vmean)
            if vmean < best_val:
                best_val = vmean
                trainer.save_checkpoint(
                    os.path.abspath(args.ckpt_dir), step, params, opt_state,
                    extra={"epoch": epoch, "val_loss": vmean},
                )
        if epoch % train_cfg.checkpoint_every == 0:
            trainer.save_checkpoint(
                os.path.abspath(args.ckpt_dir), step, params, opt_state,
                extra={"epoch": epoch},
            )
    logger.info("training complete")


if __name__ == "__main__":
    main()
