import numpy as np

from diffusion_spacetime_attn_tpu.config import ScheduleConfig
from diffusion_spacetime_attn_tpu.ops.schedule import (
    make_beta_schedule,
    make_ddim_timesteps,
    make_schedule,
    q_sample,
)


def test_linear_betas_match_compvis_formula():
    cfg = ScheduleConfig()
    betas = make_beta_schedule(cfg)
    expected = np.linspace(0.00085 ** 0.5, 0.0120 ** 0.5, 1000) ** 2
    np.testing.assert_allclose(betas, expected, rtol=1e-12)
    assert betas.shape == (1000,)


def test_ddim_timesteps_uniform_50():
    ts = make_ddim_timesteps(50, 1000)
    assert ts[0] == 1 and ts[-1] == 981
    assert len(ts) == 50
    assert np.all(np.diff(ts) == 20)


def test_schedule_loop_order_starts_at_981():
    sched = make_schedule(ScheduleConfig(), 50)
    assert int(sched.timesteps[0]) == 981  # attention.py:240 trigger step
    assert int(sched.timesteps[-1]) == 1
    assert int(sched.timesteps_next[0]) == 961
    assert int(sched.timesteps_next[-1]) == 1  # clamped at the end
    # alphas_prev at the last loop step is alphas_cumprod[0]
    np.testing.assert_allclose(
        sched.alphas_prev[-1], sched.alphas_cumprod[0], rtol=1e-6
    )
    # monotonic: more noise at the start of the loop
    a = np.asarray(sched.alphas)
    assert np.all(np.diff(a) > 0)


def test_q_sample_endpoints():
    sched = make_schedule(ScheduleConfig(), 50)
    x0 = np.ones((2, 4, 4, 1), np.float32)
    noise = np.full((2, 4, 4, 1), 2.0, np.float32)
    t = np.array([0, 999])
    out = np.asarray(q_sample(sched, x0, t, noise))
    ac = np.asarray(sched.alphas_cumprod)
    for b, tt in enumerate(t):
        expect = np.sqrt(ac[tt]) * 1.0 + np.sqrt(1 - ac[tt]) * 2.0
        np.testing.assert_allclose(out[b], expect, rtol=1e-5)
