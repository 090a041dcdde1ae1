#!/usr/bin/env python
"""VG/VG-MSDN batch layout inference CLI.

Reference: `inference/inference_vg_msdn.py` (`build_inference` dispatch for
vg_msdn datasets) — batch scene-graph → layout inference with drawn layout
PNGs, sg2im scene-graph JSONs, relation logs, and normalized layout JSONs.

  python scripts/infer_vg_msdn.py --instances vg_msdn.json --out out/ \\
      --layout-save out/layouts --ckpt checkpoint_90_0.0.pth --limit 100
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", required=True,
                    help="VG-MSDN instances JSON (records with objects + "
                         "relationships), or a single sg2im-style JSON dict")
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--layout-save", default=None,
                    help="also write normalized layout JSONs here")
    ap.add_argument("--ckpt", default=None,
                    help="layout checkpoint (orbax dir, fairseq .pth, or HF "
                         ".pth); random weights without")
    ap.add_argument("--vocab", default=None, help="RoBERTa vocab.json")
    ap.add_argument("--merges", default=None, help="RoBERTa merges.txt")
    ap.add_argument("--fairseq-dict", default=None,
                    help="test-dictionary.pkl for fairseq-id tokenization")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tiny", action="store_true", help="tiny model (smoke)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffusion_spacetime_attn_tpu.config import LayoutConfig
    from diffusion_spacetime_attn_tpu.pipeline.frontend import LayoutInference
    from diffusion_spacetime_attn_tpu.pipeline.vg_inference import VGMSDNInference
    from diffusion_spacetime_attn_tpu.utils.loader import load_layout_predictor
    from diffusion_spacetime_attn_tpu.utils.tokenizer import make_roberta_tokenizer

    cfg = LayoutConfig(hidden=32, layers=2, heads=2, ffn_dim=64,
                       vocab_size=50265, max_len=32) if args.tiny else LayoutConfig()
    model, params = load_layout_predictor(cfg, args.ckpt)
    tokenizer = make_roberta_tokenizer(args.vocab, args.merges,
                                       fairseq_dict_path=args.fairseq_dict)
    li = LayoutInference(model, params, tokenizer, cfg.max_len)
    vg = VGMSDNInference(li, args.out)

    with open(args.instances) as f:
        data = json.load(f)
    if isinstance(data, dict):
        data = [data]
    results = vg.run(data[: args.limit or len(data)],
                     layout_save=args.layout_save, batch=args.batch)
    done = sum(1 for r in results if "png" in r)
    print(f"wrote {done}/{len(results)} layouts to {args.out}")


if __name__ == "__main__":
    main()
