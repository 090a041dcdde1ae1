"""LDM (UNet) training harness tests — reference semantics replicated in
numpy per project convention (`main.py`, `ddpm.py:148-169,323-326,1030-1062`,
`ldm/modules/ema.py`)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_spacetime_attn_tpu.config import (
    LDMTrainConfig,
    ScheduleConfig,
    UNetConfig,
)
from diffusion_spacetime_attn_tpu.models.unet import UNet
from diffusion_spacetime_attn_tpu.ops.schedule import make_schedule
from diffusion_spacetime_attn_tpu.training.ldm_trainer import (
    LDMTrainer,
    ema_decay,
    lvlb_weights,
    make_train_step,
    init_state,
    p_losses,
    scaled_lr,
)
from diffusion_spacetime_attn_tpu.utils.testing import randomize_params

TINY = UNetConfig(
    model_channels=32,
    channel_mult=(1, 2),
    num_res_blocks=1,
    attention_resolutions=(1, 2),
    num_heads=2,
    context_dim=16,
)
SCHED_CFG = ScheduleConfig()


def _numpy_lvlb_eps(cfg: ScheduleConfig) -> np.ndarray:
    # direct replication of ddpm.py:139-167 (v_posterior=0, eps param)
    betas = (
        np.linspace(
            cfg.linear_start ** 0.5, cfg.linear_end ** 0.5,
            cfg.num_train_timesteps, dtype=np.float64,
        )
        ** 2
    )
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    # the reference computes w[0] as 0/0 then patches it (ddpm.py:163-167);
    # replicate exactly but keep the suite warning-clean
    with np.errstate(divide="ignore", invalid="ignore"):
        w = betas ** 2 / (2 * post_var * alphas * (1 - ac))
    w[0] = w[1]
    return w


def test_lvlb_weights_match_reference_formula():
    w = lvlb_weights(SCHED_CFG, "eps")
    np.testing.assert_allclose(w, _numpy_lvlb_eps(SCHED_CFG), rtol=1e-5)
    assert np.isfinite(lvlb_weights(SCHED_CFG, "x0")).all()


def test_scaled_lr_rule():
    # main.py:686: lr = accum × ngpu × batch × base_lr
    cfg = LDMTrainConfig(base_lr=1e-4, accum_steps=2, batch_size=4)
    assert scaled_lr(cfg, 4, 8) == pytest.approx(2 * 8 * 4 * 1e-4)
    cfg = dataclasses.replace(cfg, scale_lr=False)
    assert scaled_lr(cfg, 4, 8) == pytest.approx(1e-4)


def test_ema_ramp():
    # LitEma: decay = min(decay, (1+step)/(10+step))
    assert float(ema_decay(jnp.asarray(0), 0.9999)) == pytest.approx(0.1)
    assert float(ema_decay(jnp.asarray(10 ** 6), 0.9999)) == pytest.approx(0.9999)


@pytest.fixture(scope="module")
def tiny_setup():
    unet = UNet(TINY, radius=0.2)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, 16))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    params = randomize_params(params, jax.random.PRNGKey(1))

    def eps_model(p, x, t, c):
        return unet.apply({"params": p}, x, t, c)

    schedule = make_schedule(SCHED_CFG, 50)
    return eps_model, params, schedule


def test_train_step_decreases_loss(tiny_setup):
    eps_model, params, schedule = tiny_setup
    cfg = LDMTrainConfig(use_ema=True, scale_lr=False, base_lr=2e-4)
    step = jax.jit(make_train_step(cfg, SCHED_CFG, schedule, eps_model, 2e-4))
    state = init_state(cfg, SCHED_CFG, params, 2e-4)

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 7, 16), jnp.float32)

    losses = []
    key = jax.random.PRNGKey(7)
    for i in range(30):
        # fixed data, fresh (t, noise) draws — loss trend must go down
        state, metrics = step(state, x0, ctx, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # EMA stays a valid pytree tracking params
    flat_p = jax.tree_util.tree_leaves(state.params)
    flat_e = jax.tree_util.tree_leaves(state.ema_params)
    assert all(np.isfinite(np.asarray(e)).all() for e in flat_e)
    assert len(flat_p) == len(flat_e)


def test_learn_logvar_updates_logvar(tiny_setup):
    eps_model, params, schedule = tiny_setup
    cfg = LDMTrainConfig(use_ema=False, learn_logvar=True, scale_lr=False)
    step = jax.jit(make_train_step(cfg, SCHED_CFG, schedule, eps_model, 1e-3))
    state = init_state(cfg, SCHED_CFG, params, 1e-3)
    x0 = jnp.ones((2, 16, 16, 4))
    ctx = jnp.zeros((2, 7, 16))
    state2, metrics = step(state, x0, ctx, jax.random.PRNGKey(0))
    assert "logvar" in metrics
    assert not np.allclose(np.asarray(state2.logvar), np.asarray(state.logvar))


def test_p_losses_elbo_term(tiny_setup):
    # original_elbo_weight adds exactly lvlb_w[t]-weighted simple loss
    eps_model, params, schedule = tiny_setup
    w = jnp.asarray(lvlb_weights(SCHED_CFG, "eps"))
    base = LDMTrainConfig(original_elbo_weight=0.0)
    elbo = LDMTrainConfig(original_elbo_weight=0.5)
    x0 = jnp.ones((2, 16, 16, 4)) * 0.1
    ctx = jnp.zeros((2, 7, 16))
    logvar = jnp.zeros((SCHED_CFG.num_train_timesteps,))
    rng = jax.random.PRNGKey(3)
    l0, m0 = p_losses(base, schedule, w, eps_model, params, logvar, x0, ctx, rng)
    l1, m1 = p_losses(elbo, schedule, w, eps_model, params, logvar, x0, ctx, rng)
    np.testing.assert_allclose(
        float(l1), float(l0) + 0.5 * float(m0["loss_vlb"]), rtol=1e-6
    )


def test_data_parallel_step_matches_single_device(tiny_setup):
    from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh

    eps_model, params, schedule = tiny_setup
    cfg = LDMTrainConfig(use_ema=False, scale_lr=False)
    mesh = make_mesh(data=len(jax.devices()))
    trainer = LDMTrainer(cfg, SCHED_CFG, schedule, eps_model, mesh=mesh)
    state = trainer.init(params)
    rng = np.random.RandomState(1)
    B = len(jax.devices())
    x0 = jnp.asarray(rng.randn(B, 16, 16, 4), jnp.float32)
    ctx = jnp.asarray(rng.randn(B, 7, 16), jnp.float32)
    key = jax.random.PRNGKey(5)
    sharded_state, sharded_m = trainer.train_step(state, x0, ctx, key)

    single = LDMTrainer(cfg, SCHED_CFG, schedule, eps_model, mesh=None)
    single_state, single_m = single.train_step(single.init(params), x0, ctx, key)
    np.testing.assert_allclose(
        float(sharded_m["loss"]), float(single_m["loss"]), rtol=2e-5
    )
    a = jax.tree_util.tree_leaves(sharded_state.params)[0]
    b = jax.tree_util.tree_leaves(single_state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    eps_model, params, schedule = tiny_setup
    cfg = LDMTrainConfig(use_ema=False, scale_lr=False)
    tr = LDMTrainer(cfg, SCHED_CFG, schedule, eps_model, ckpt_dir=str(tmp_path))
    state = tr.init(params)
    state, _ = tr.train_step(
        state, jnp.ones((2, 16, 16, 4)), jnp.zeros((2, 7, 16)),
        jax.random.PRNGKey(0),
    )
    tr.save(state, 1)
    restored = tr.restore(1, state)
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(state.step)
    )
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compvis_lr_schedules_match_reference_formulas():
    """warmup_cosine / cosine2 / lambda_linear vs direct numpy replications of
    `ldm/lr_scheduler.py:4-98` (same warmup line, cosine/linear decay, cycle
    arithmetic)."""
    import numpy as np

    from diffusion_spacetime_attn_tpu.training.schedules import (
        lambda_linear_schedule,
        warmup_cosine_schedule,
        warmup_cosine_schedule2,
    )

    # --- scheduler 1 ---
    s = warmup_cosine_schedule(10, lr_min=0.1, lr_max=1.0, lr_start=0.0,
                               max_decay_steps=50)
    for n in [0, 3, 9, 10, 25, 49, 60]:
        if n < 10:
            want = (1.0 - 0.0) / 10 * n + 0.0
        else:
            t = min((n - 10) / (50 - 10), 1.0)
            want = 0.1 + 0.5 * (1.0 - 0.1) * (1 + np.cos(t * np.pi))
        np.testing.assert_allclose(float(s(jnp.asarray(n))), want, rtol=1e-5,
                                   err_msg=f"n={n}")

    # --- scheduler 2 (two cycles, cosine) ---
    wu, fmin, fmax, fstart, cyc = [5, 3], [0.2, 0.1], [1.0, 0.5], [0.0, 0.0], [20, 30]
    s2 = warmup_cosine_schedule2(wu, fmin, fmax, fstart, cyc)
    cum = np.cumsum([0] + cyc)

    def ref2(n, cosine):
        c = 0 if n <= cum[1] else 1
        m = n - cum[c]
        if m < wu[c]:
            return (fmax[c] - fstart[c]) / wu[c] * m + fstart[c]
        if cosine:
            t = min((m - wu[c]) / (cyc[c] - wu[c]), 1.0)
            return fmin[c] + 0.5 * (fmax[c] - fmin[c]) * (1 + np.cos(t * np.pi))
        return fmin[c] + (fmax[c] - fmin[c]) * (cyc[c] - m) / cyc[c]

    for n in [0, 2, 5, 12, 20, 21, 22, 24, 35, 49]:
        np.testing.assert_allclose(float(s2(jnp.asarray(n))), ref2(n, True),
                                   rtol=1e-5, err_msg=f"n={n}")

    # --- lambda_linear (the SD configs' scheduler) ---
    s3 = lambda_linear_schedule(wu, fmin, fmax, fstart, cyc)
    for n in [0, 2, 5, 12, 20, 21, 24, 35, 49]:
        np.testing.assert_allclose(float(s3(jnp.asarray(n))), ref2(n, False),
                                   rtol=1e-5, err_msg=f"n={n}")


def test_ldm_trainer_with_lambda_linear_schedule_steps():
    """A few train steps with the scheduled optimizer: lr multiplier starts
    near f_start (tiny updates) and grows over warmup."""
    cfg = LDMTrainConfig(batch_size=2, base_lr=1e-3, scale_lr=False,
                         use_ema=False, lr_schedule="lambda_linear",
                         lr_warmup_steps=100)
    sched_cfg = ScheduleConfig(num_train_timesteps=16)
    schedule = make_schedule(sched_cfg, 4)

    def eps_model(params, x, t, context):
        return x * params["w"]

    step = make_train_step(cfg, sched_cfg, schedule, eps_model, lr=1e-3)
    params = {"w": jnp.ones(())}
    state = init_state(cfg, sched_cfg, params, 1e-3)
    x0 = jnp.ones((2, 4, 4, 2))
    ctx = jnp.zeros((2, 3, 8))
    s1, _ = step(state, x0, ctx, jax.random.PRNGKey(0))
    d1 = abs(float(s1.params["w"]) - 1.0)
    for _ in range(20):
        s1, _ = step(s1._replace(step=s1.step), x0, ctx, jax.random.PRNGKey(1))
    # after warmup progress the multiplier (and typical update size) grew
    assert d1 < 1e-6  # first update scaled by ~f_start=1e-6
    assert abs(float(s1.params["w"]) - 1.0) > d1


def test_ldm_trainer_class_conditioning_under_mesh():
    """Class-conditional LDM (ClassEmbedder context trained jointly, rank-2
    context) through the data-parallel mesh path (context_rank plumbed to
    the sharding specs)."""
    from diffusion_spacetime_attn_tpu.models.encoders import ClassEmbedder
    from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8)
    embed = ClassEmbedder(n_classes=10, embed_dim=8)

    def eps_model(params, x, t, context):
        ctx = embed.apply({"params": params["cond"]},
                          context[:, 0].astype(jnp.int32))
        return x * params["w"] + jnp.mean(ctx)

    cfg = LDMTrainConfig(batch_size=1, base_lr=1e-3, scale_lr=False,
                         use_ema=False)
    sched_cfg = ScheduleConfig(num_train_timesteps=8)
    trainer = LDMTrainer(cfg, sched_cfg, make_schedule(sched_cfg, 4),
                         eps_model, mesh=mesh, context_rank=2)
    params = {
        "w": jnp.ones(()),
        "cond": embed.init(jax.random.PRNGKey(0),
                           jnp.zeros((1,), jnp.int32))["params"],
    }
    state = trainer.init(params)
    x0 = jnp.ones((8, 4, 4, 2))
    ctx = jnp.asarray(np.arange(8, dtype=np.float32)[:, None] % 10)
    state, metrics = trainer.train_step(state, x0, ctx, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # the class embedding received gradient (trained jointly)
    delta = jnp.abs(state.params["cond"]["embedding"]["embedding"]
                    - params["cond"]["embedding"]["embedding"]).max()
    assert float(delta) > 0.0


def test_fsdp_step_matches_single_device(tiny_setup):
    """fsdp=True: weights + Adam moments + EMA sharded over the data axis
    (largest divisible dim), numerics identical to the replicated step."""
    from diffusion_spacetime_attn_tpu.parallel.mesh import make_mesh

    eps_model, params, schedule = tiny_setup
    cfg = LDMTrainConfig(use_ema=True, scale_lr=False)
    mesh = make_mesh(data=len(jax.devices()))
    trainer = LDMTrainer(cfg, SCHED_CFG, schedule, eps_model, mesh=mesh,
                         fsdp=True)
    state = trainer.init(params)
    # at least one large leaf actually sharded on 'data'
    sharded_leaves = [
        l for l in jax.tree_util.tree_leaves(state.params)
        if hasattr(l, "sharding") and "data" in str(l.sharding.spec)
    ]
    assert sharded_leaves, "no parameter leaf got FSDP-sharded"

    rng = np.random.RandomState(2)
    B = len(jax.devices())
    x0 = jnp.asarray(rng.randn(B, 16, 16, 4), jnp.float32)
    ctx = jnp.asarray(rng.randn(B, 7, 16), jnp.float32)
    key = jax.random.PRNGKey(6)
    fsdp_state, fsdp_m = trainer.train_step(state, x0, ctx, key)
    # state stays sharded across steps (out_shardings pin it)
    out_leaf = [
        l for l in jax.tree_util.tree_leaves(fsdp_state.params)
        if hasattr(l, "sharding") and "data" in str(l.sharding.spec)
    ]
    assert out_leaf

    single = LDMTrainer(cfg, SCHED_CFG, schedule, eps_model, mesh=None)
    s_state, s_m = single.train_step(single.init(params), x0, ctx, key)
    np.testing.assert_allclose(float(fsdp_m["loss"]), float(s_m["loss"]),
                               rtol=2e-5)
    a = jax.tree_util.tree_leaves(fsdp_state.params)[0]
    b = jax.tree_util.tree_leaves(s_state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    e = jax.tree_util.tree_leaves(fsdp_state.ema_params)[0]
    f = jax.tree_util.tree_leaves(s_state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(e), np.asarray(f), atol=2e-5)
