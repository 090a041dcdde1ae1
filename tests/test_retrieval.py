"""Retrieval subsystem (knn2img / train_searcher equivalents).

Reference semantics: `scripts/knn2img.py:61-166` (Searcher: normalized
embeddings, cosine top-k, returned normalized neighbor embeddings) and
`scripts/knn2img.py:355-365` (conditioning assembly, zero uncond).
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_spacetime_attn_tpu.pipeline.retrieval import (
    Retriever,
    build_database_from_images,
    exact_search,
    normalize,
    sharded_search,
)


def _db(m=64, d=16, seed=0):
    emb = np.random.RandomState(seed).randn(m, d).astype(np.float32)
    return emb / np.linalg.norm(emb, axis=-1, keepdims=True)


def test_exact_search_matches_numpy():
    db = _db()
    q = np.random.RandomState(1).randn(5, 16).astype(np.float32)
    scores, idx = exact_search(jnp.asarray(db), jnp.asarray(q), k=4)
    sim = (q / np.linalg.norm(q, axis=-1, keepdims=True)) @ db.T
    want = np.argsort(-sim, axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(idx), want)
    np.testing.assert_allclose(
        np.asarray(scores), np.take_along_axis(sim, want, 1), rtol=1e-5)


def test_sharded_search_equals_exact():
    from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8)
    db = _db(m=100)  # not divisible by 8 → exercises padding
    q = np.random.RandomState(2).randn(3, 16).astype(np.float32)
    s0, i0 = exact_search(jnp.asarray(db), jnp.asarray(q), k=5)
    s1, i1 = sharded_search(jnp.asarray(db), jnp.asarray(q), k=5, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)


def test_retriever_roundtrip_and_search(tmp_path):
    db = _db(m=32)
    r = Retriever(embedding=jnp.asarray(db), img_id=np.arange(32),
                  patch_coords=np.zeros((32, 4), np.float32))
    p = str(tmp_path / "db.npz")
    r.save_npz(p)
    r2 = Retriever.from_npz(p)
    out = r2.search(jnp.asarray(db[:3]), k=1)
    # each row's nearest neighbor is itself
    np.testing.assert_array_equal(np.asarray(out["nns"])[:, 0], [0, 1, 2])
    assert out["nn_embeddings"].shape == (3, 1, 16)
    # returned neighbor embeddings are normalized (knn2img.py:152)
    n = np.linalg.norm(np.asarray(out["nn_embeddings"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_build_database_from_images():
    imgs = np.random.RandomState(0).rand(10, 8, 8, 3).astype(np.float32)

    def fake_embed(px):  # mean-pool "tower"
        return jnp.mean(px, axis=(1, 2)).repeat(4, axis=-1)

    r = build_database_from_images(imgs, fake_embed, batch=4)
    assert r.embedding.shape == (10, 12)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r.embedding), axis=-1), 1.0, atol=1e-5)
    assert r.patch_coords.shape == (10, 4)


def test_rdm_conditioning_and_tiny_sample():
    from diffusion_spacetime_attn_tpu.pipeline.knn2img import (
        RetrievalAugmentedDiffusion,
    )
    from diffusion_spacetime_attn_tpu.utils.testing import randomize_params

    rdm = RetrievalAugmentedDiffusion.create(
        jax.random.PRNGKey(0), steps=4, dtype="float32", tiny=True,
        abstract=False)
    rdm.unet_params = randomize_params(rdm.unet_params, jax.random.PRNGKey(1))
    rdm.vae_params = randomize_params(rdm.vae_params, jax.random.PRNGKey(2))

    db = _db(m=16, d=16)
    r = Retriever(embedding=jnp.asarray(db), img_id=np.arange(16),
                  patch_coords=np.zeros((16, 4), np.float32))
    txt = jnp.asarray(np.random.RandomState(3).randn(2, 16), jnp.float32)
    cond = rdm.build_conditioning(txt, r, knn=3)
    assert cond.shape == (2, 4, 16)  # text + 3 neighbors
    # row 0 of the conditioning is the normalized text embedding
    np.testing.assert_allclose(
        np.asarray(cond[:, 0]), np.asarray(normalize(txt)), rtol=1e-5)

    img = rdm.sample(cond, jax.random.PRNGKey(4), sampler="ddim")
    # tiny VAE has 2 levels → f=2 (the full RDM f16 decodes 48→768)
    assert img.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
    assert float(jnp.min(img)) >= 0.0 and float(jnp.max(img)) <= 1.0


def test_rdm_full_configs_match_reference_yaml():
    """Architecture constants vs `configs/retrieval-augmented-diffusion/
    768x768.yaml` (checked literally; the yaml itself is not shipped here)."""
    from diffusion_spacetime_attn_tpu.pipeline.knn2img import (
        rdm_schedule_config, rdm_unet_config, rdm_vae_config,
    )

    u = rdm_unet_config()
    assert (u.in_channels, u.out_channels, u.model_channels) == (16, 16, 448)
    assert u.channel_mult == (1, 2, 3, 4) and u.num_head_channels == 32
    assert u.context_dim == 768
    v = rdm_vae_config()
    assert v.z_channels == 16 and v.ch_mult == (1, 1, 2, 2, 4)
    assert v.attn_resolutions == (16,)
    s = rdm_schedule_config()
    assert (s.linear_start, s.linear_end) == (0.0015, 0.015)
