"""DMD diffusion distillation (reference: fastgen/methods/dmd.py —
student VSD loss, fake-score DSM loss, EMA, alternation)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from modelopt_tpu.core import ModelBundle
from modelopt_tpu.fastgen import DMDConfig, DMDPipeline
from modelopt_tpu.models import DiT, dit_config_s


def _teacher(seed=0):
    cfg = dit_config_s(dtype=jnp.float32, num_layers=2, hidden_size=64)
    m = DiT(cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, cfg.in_channels))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.zeros((2,), jnp.int32)
    variables = m.init(jax.random.PRNGKey(seed), x, t, y)
    return ModelBundle(module=m, variables=dict(variables),
                       example_inputs=(x, t, y))


def test_vsd_zero_when_fake_equals_teacher():
    """When the fake score IS the teacher, the distribution-matching
    gradient is exactly zero — the sg-trick loss must vanish."""
    pipe = DMDPipeline(_teacher(), DMDConfig())
    y = jnp.zeros((2,), jnp.int32)
    loss = pipe.student_loss(pipe.teacher_params, pipe.teacher_params,
                             jax.random.PRNGKey(1), y)
    assert float(loss) == 0.0


def test_fake_score_training_reduces_dsm_loss():
    pipe = DMDPipeline(_teacher(), DMDConfig())
    tx = optax.adam(1e-3)
    state = pipe.init_state(tx, tx)
    fake_step, _ = pipe.make_steps(tx, tx)
    y = jnp.zeros((2,), jnp.int32)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        # fixed rng: pure optimization progress on one batch
        state, loss = fake_step(state, jax.random.PRNGKey(7), y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_alternating_loop_and_generation():
    pipe = DMDPipeline(_teacher(), DMDConfig(ema_decay=0.9))
    tx = optax.adam(1e-4)
    state = pipe.init_state(tx, tx)
    fake_step, student_step = pipe.make_steps(tx, tx)
    y = jnp.zeros((2,), jnp.int32)
    rng = jax.random.PRNGKey(0)
    for i in range(6):
        rng, r1, r2 = jax.random.split(rng, 3)
        state, f_loss = fake_step(state, r1, y)
        if i % 2 == 1:
            state, s_loss = student_step(state, r2, y)
            assert np.isfinite(float(s_loss))
    # ema tracked the student (moved away from init once student moved)
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state["ema_params"], pipe.teacher_params))
    assert max(moved) > 0
    # one-step generation produces finite images at the sampler's shape
    img = pipe.generate(state["ema_params"], jax.random.PRNGKey(3), y)
    assert img.shape == (2, 16, 16, 4)
    assert bool(jnp.isfinite(img).all())


def test_multi_step_schedule_generates():
    pipe = DMDPipeline(_teacher(), DMDConfig(step_schedule=(999, 499, 99)))
    y = jnp.zeros((2,), jnp.int32)
    x = pipe.generate(pipe.teacher_params, jax.random.PRNGKey(0), y)
    cfg = pipe.dit_cfg
    assert x.shape == (2, cfg.image_size, cfg.image_size, cfg.in_channels)
    import numpy as np
    assert np.isfinite(np.asarray(x)).all()


def test_rf_parameterization_losses_and_vsd_zero():
    pipe = DMDPipeline(_teacher(), DMDConfig(parameterization="rf"))
    y = jnp.zeros((2,), jnp.int32)
    # fake == teacher -> DMD gradient exactly zero, in rf too
    loss = pipe.student_loss(pipe.teacher_params, pipe.teacher_params,
                             jax.random.PRNGKey(1), y)
    assert float(loss) == 0.0
    dsm = pipe.fake_score_loss(pipe.teacher_params, pipe.teacher_params,
                               jax.random.PRNGKey(2), y)
    assert float(dsm) > 0.0
    # rf timestep sampling stays on the clipped integer grid
    t = pipe._sample_t(jax.random.PRNGKey(3), 256)
    import numpy as np
    tn = np.asarray(t)
    assert tn.min() >= pipe.cfg.t_min and tn.max() <= pipe.cfg.t_max


def test_gan_discriminator_trains():
    import numpy as np

    pipe = DMDPipeline(_teacher(), DMDConfig(gan_weight=0.1))
    tx = optax.adam(1e-3)
    state = pipe.init_state(tx, tx)
    assert state["disc_params"] is not None
    fake_step, student_step = pipe.make_steps(tx, tx)
    y = jnp.zeros((2,), jnp.int32)
    cfg = pipe.dit_cfg
    x_real = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(2, cfg.image_size, cfg.image_size, cfg.in_channels)),
        jnp.float32)
    d0 = None
    for i in range(8):
        state, loss = fake_step(state, jax.random.PRNGKey(7), y, x_real)
        if d0 is None:
            d0 = float(loss)
    state, sloss = student_step(state, jax.random.PRNGKey(9), y)
    assert np.isfinite(float(loss)) and np.isfinite(float(sloss))
    assert float(loss) < d0  # joint DSM+GAN objective decreases
