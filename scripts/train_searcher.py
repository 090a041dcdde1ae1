#!/usr/bin/env python
"""Build a retrieval database for knn2img — TPU-native equivalent of the
reference's `scripts/train_searcher.py`.

The reference loads precomputed CLIP patch-embedding npz files and trains a
scann index (brute-force or partitioned asymmetric hashing,
`train_searcher.py:62-113`).  Here the "index" IS the normalized embedding
matrix: search is an exact MXU matmul + top-k (`pipeline/retrieval.py`), so
"training the searcher" reduces to embedding the image collection on TPU
and storing the normalized database — simpler, and exact where scann is
approximate.

Inputs: either a directory of images (embedded with the framework's CLIP
vision tower) or an existing embeddings .npz (reference database format:
`embedding`, optional `img_id` / `patch_coords`).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", default=None, help="directory of images")
    ap.add_argument("--embeddings", default=None,
                    help="existing .npz with an `embedding` array (reference format)")
    ap.add_argument("--clip-ckpt", default=None,
                    help="OpenAI CLIP state_dict for the vision tower "
                         "(random weights without)")
    ap.add_argument("--out", default="data/rdm/searchers/database.npz")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="N random images (smoke mode)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_spacetime_attn_tpu.config import CLIPConfig
    from diffusion_spacetime_attn_tpu.models.clip import CLIP, clip_normalize
    from diffusion_spacetime_attn_tpu.pipeline.retrieval import (
        Retriever, build_database_from_images,
    )
    from diffusion_spacetime_attn_tpu.utils.cache import enable_compilation_cache
    from diffusion_spacetime_attn_tpu.utils.profiling import get_logger

    enable_compilation_cache()
    logger = get_logger("train_searcher")
    logger.info("device: %s", jax.devices()[0])

    if args.embeddings:
        r = Retriever.from_npz(args.embeddings)
        logger.info("loaded %d embeddings from %s", r.embedding.shape[0],
                    args.embeddings)
    else:
        if args.synthetic:
            imgs = np.random.RandomState(0).rand(
                args.synthetic, 224, 224, 3).astype(np.float32)
            ids = np.arange(args.synthetic)
        else:
            from PIL import Image

            files = sorted(
                f for f in os.listdir(args.image_dir)
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
            )
            imgs = np.stack([
                np.asarray(
                    Image.open(os.path.join(args.image_dir, f))
                    .convert("RGB").resize((224, 224))
                ) / 255.0
                for f in files
            ]).astype(np.float32)
            ids = np.arange(len(files))
            logger.info("embedding %d images from %s", len(files), args.image_dir)

        clip_cfg = CLIPConfig()
        clip = CLIP(clip_cfg)
        if args.clip_ckpt:
            from diffusion_spacetime_attn_tpu.utils import convert

            params = convert.convert_openai_clip(
                convert.load_torch_checkpoint(args.clip_ckpt))
        else:
            from diffusion_spacetime_attn_tpu.utils.testing import (
                randomize_params_on_device,
            )

            params = randomize_params_on_device(
                jax.eval_shape(
                    clip.init, jax.random.PRNGKey(0),
                    jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 77), jnp.int32),
                )["params"],
                jax.random.PRNGKey(1),
            )
            logger.info("no --clip-ckpt: random vision tower (smoke mode)")

        def embed(p, pixels):
            return clip.apply({"params": p}, clip_normalize(pixels),
                              method=CLIP.encode_image)

        r = build_database_from_images(imgs, embed, batch=args.batch,
                                       img_ids=ids, params=params)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    r.save_npz(args.out)
    logger.info("wrote database [%d, %d] → %s",
                r.embedding.shape[0], r.embedding.shape[1], args.out)


if __name__ == "__main__":
    main()
