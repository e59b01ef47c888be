"""DMD/DMD2: distill a many-step diffusion teacher into a few-step student
by distribution matching (reference: modelopt/torch/fastgen/methods/dmd.py
DMDPipeline — compute_student_loss VSD path :458, compute_fake_score_loss
DSM path :614; the math follows FastGen's dmd2).

Three arch-twin networks over the DiT family (models/dit.py):
  * teacher  — frozen, the many-step model being distilled;
  * student  — the few-step generator (initialized from the teacher);
  * fake score — an auxiliary net trained by denoising score matching on
    the STUDENT's own outputs, so it tracks the student distribution's
    score the way the teacher tracks the data distribution's.

Student update (VSD): for x0_s = student(z), noise to x_t, get both
score-nets' x0 predictions; the distribution-matching gradient is
(fake_x0 - teacher_x0), applied through the classic sg-trick

    L = || x0_s - sg(x0_s - w * (fake_x0 - teacher_x0)) ||^2

so dL/dx0_s equals the DMD gradient exactly. Alternation, EMA tracking,
and both losses live under jit; the caller drives the loop (same division
of labor as the reference pipeline).

JAX shape: no module cloning or hooks — the three networks are one DiT
module applied with three parameter pytrees, and "frozen" means
stop_gradient/no-optimizer, not requires_grad flags.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.bundle import ModelBundle


@dataclasses.dataclass
class DMDConfig:
    """Reference counterpart: fastgen DMDConfig (dmd.py)."""

    num_timesteps: int = 1000
    # t sampling range for the matching losses (avoid the degenerate ends)
    t_min: int = 20
    t_max: int = 979
    # generator input timestep (max noise -> one-step generation)
    student_t: int = 999
    vsd_weight: float = 1.0
    ema_decay: float = 0.999


def _alphas(n: int):
    # the schedule ddim_sample uses (models/dit.py) — kept identical so a
    # distilled student plugs straight into the same sampler
    return jnp.linspace(0.999, 0.01, n)


class DMDPipeline:
    """Holds the three parameter sets + jitted losses/steps.

    Usage::

        pipe = DMDPipeline(teacher_bundle, DMDConfig())
        state = pipe.init_state(tx_g, tx_f)
        for step in range(n):
            state, f_loss = pipe.fake_step(state, rng1, y)
            if step % 2:   # e.g. 1:1 alternation
                state, s_loss = pipe.student_step(state, rng2, y)
        samples = pipe.generate(state.student_params, rng3, y)
    """

    def __init__(self, teacher: ModelBundle, cfg: Optional[DMDConfig] = None):
        self.cfg = cfg or DMDConfig()
        self.bundle = teacher
        self.module = teacher.module
        self.dit_cfg = teacher.module.cfg
        self.teacher_params = teacher.variables["params"]
        self.alphas = _alphas(self.cfg.num_timesteps)

    # -- model wrappers -----------------------------------------------------
    def _eps(self, params, x, t, y):
        variables = {**self.bundle.variables, "params": params}
        with self.bundle.contexts():
            return self.module.apply(
                variables, x.astype(self.dit_cfg.dtype), t, y
            ).astype(jnp.float32)

    def _x0(self, params, x_t, t, y):
        a = jnp.take(self.alphas, t)[:, None, None, None]
        eps = self._eps(params, x_t, t, y)
        return (x_t - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)

    def generate(self, student_params, rng, y):
        """One-step generation: student's x0 prediction from pure noise at
        the max-noise timestep."""
        cfg = self.dit_cfg
        B = y.shape[0]
        z = jax.random.normal(
            rng, (B, cfg.image_size, cfg.image_size, cfg.in_channels),
            jnp.float32,
        )
        t = jnp.full((B,), self.cfg.student_t, jnp.int32)
        return self._x0(student_params, z, t, y)

    # -- losses ---------------------------------------------------------------
    def fake_score_loss(self, fake_params, student_params, rng, y):
        """Denoising score matching on the STUDENT's outputs (reference:
        compute_fake_score_loss — grads w.r.t. fake_params only)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        x0 = jax.lax.stop_gradient(self.generate(student_params, r1, y))
        B = y.shape[0]
        t = jax.random.randint(r2, (B,), self.cfg.t_min, self.cfg.t_max + 1)
        a = jnp.take(self.alphas, t)[:, None, None, None]
        noise = jax.random.normal(r3, x0.shape, jnp.float32)
        x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise
        eps_pred = self._eps(fake_params, x_t, t, y)
        return jnp.mean(jnp.square(eps_pred - noise))

    def student_loss(self, student_params, fake_params, rng, y):
        """VSD / distribution-matching loss (reference:
        compute_student_loss :458, vsd_loss)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        x0_s = self.generate(student_params, r1, y)
        B = y.shape[0]
        t = jax.random.randint(r2, (B,), self.cfg.t_min, self.cfg.t_max + 1)
        a = jnp.take(self.alphas, t)[:, None, None, None]
        noise = jax.random.normal(r3, x0_s.shape, jnp.float32)
        x_t = jnp.sqrt(a) * x0_s + jnp.sqrt(1.0 - a) * noise
        teacher_x0 = jax.lax.stop_gradient(
            self._x0(self.teacher_params, x_t, t, y)
        )
        fake_x0 = jax.lax.stop_gradient(self._x0(fake_params, x_t, t, y))
        grad = fake_x0 - teacher_x0
        # per-sample normalizer (DMD2): keeps the gradient scale-invariant
        norm = jnp.mean(jnp.abs(x0_s - teacher_x0), axis=(1, 2, 3),
                        keepdims=True) + 1e-6
        target = jax.lax.stop_gradient(x0_s - self.cfg.vsd_weight * grad / norm)
        return 0.5 * jnp.mean(jnp.square(x0_s - target))

    # -- training loop pieces -------------------------------------------------
    def init_state(self, tx_g, tx_f):
        student = jax.tree.map(jnp.copy, self.teacher_params)
        fake = jax.tree.map(jnp.copy, self.teacher_params)
        return {
            "student_params": student,
            "fake_params": fake,
            "ema_params": jax.tree.map(jnp.copy, student),
            "g_opt": tx_g.init(student),
            "f_opt": tx_f.init(fake),
        }

    def make_steps(self, tx_g, tx_f):
        """(fake_step, student_step) — both jitted, optimizers closed over;
        EMA folds into the student step (reference: the pipeline's
        ExponentialMovingAverage tracker)."""
        import optax

        decay = self.cfg.ema_decay

        @jax.jit
        def fake_step(state, rng, y):
            loss, grads = jax.value_and_grad(self.fake_score_loss)(
                state["fake_params"], state["student_params"], rng, y
            )
            updates, f_opt = tx_f.update(grads, state["f_opt"],
                                         state["fake_params"])
            fake = optax.apply_updates(state["fake_params"], updates)
            return {**state, "fake_params": fake, "f_opt": f_opt}, loss

        @jax.jit
        def student_step(state, rng, y):
            loss, grads = jax.value_and_grad(self.student_loss)(
                state["student_params"], state["fake_params"], rng, y
            )
            updates, g_opt = tx_g.update(grads, state["g_opt"],
                                         state["student_params"])
            student = optax.apply_updates(state["student_params"], updates)
            ema = jax.tree.map(
                lambda e, p: decay * e + (1.0 - decay) * p,
                state["ema_params"], student,
            )
            return {**state, "student_params": student, "g_opt": g_opt,
                    "ema_params": ema}, loss

        return fake_step, student_step
