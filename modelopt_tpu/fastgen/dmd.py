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

so dL/dx0_s equals the DMD gradient exactly.

Beyond the core DMD loop this carries the reference's fastgen extras:
  * multi-step students — ``step_schedule`` re-noises stochastically
    between schedule points (gradient flows through the final step only,
    DMD2's backward-simulation convention);
  * rectified-flow teachers — ``parameterization="rf"`` switches the
    affine noising to x_t = (1-sigma) x0 + sigma eps with v-prediction and
    logit-normal timestep sampling (reference: fastgen/flow_matching.py);
  * a DMD2 GAN term — a token-MLP discriminator head over the FAKE score
    net's selected block features (reference: fastgen/discriminators.py
    Discriminator_ImageDiT; token heads are the DiT-native analogue of its
    conv heads), trained on real data when ``gan_weight > 0``;
  * EMA of the student folded into the jitted student step (reference:
    fastgen/ema.py).

JAX shape: no module cloning or hooks — the networks are one DiT module
applied with distinct parameter pytrees; features come from flax
capture_intermediates, and "frozen" means stop_gradient/no-optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.bundle import ModelBundle


@dataclasses.dataclass
class DMDConfig:
    """Reference counterpart: fastgen DMDConfig (config.py)."""

    num_timesteps: int = 1000
    # t sampling range for the matching losses (avoid the degenerate ends)
    t_min: int = 20
    t_max: int = 979
    # student generation timesteps, descending; one entry = one-step DMD,
    # several = DMD2 multi-step student (stochastic re-noise between)
    step_schedule: tuple = (999,)
    vsd_weight: float = 1.0
    ema_decay: float = 0.999
    # "eps" = DDPM epsilon-prediction; "rf" = rectified-flow v-prediction
    parameterization: str = "eps"
    # logit-normal timestep density for rf matching losses (reference:
    # flow_matching._truncated_lognormal)
    rf_t_mean: float = 0.0
    rf_t_std: float = 1.0
    # DMD2 GAN: weight of the non-saturating generator term; 0 disables.
    # The discriminator reads the fake net's block features at these
    # indices (None = last block).
    gan_weight: float = 0.0
    disc_features: Optional[tuple] = None


def _alphas(n: int):
    # the schedule ddim_sample uses (models/dit.py) — kept identical so a
    # distilled student plugs straight into the same sampler
    return jnp.linspace(0.999, 0.01, n)


class FeatureDiscriminator(nn.Module):
    """Per-feature token-MLP heads, summed: [B, P, H] -> logits [B]
    (reference: fastgen/discriminators.py Discriminator_ImageDiT, adapted
    from conv heads to the token space DiT features live in)."""

    n_features: int

    @nn.compact
    def __call__(self, feats):
        logit = 0.0
        for i, f in enumerate(feats):
            h = nn.LayerNorm(name=f"norm_{i}")(f.astype(jnp.float32))
            h = nn.gelu(nn.Dense(f.shape[-1], name=f"mix_{i}")(h))
            logit = logit + jnp.mean(nn.Dense(1, name=f"head_{i}")(h),
                                     axis=(1, 2))
        return logit  # [B]


class DMDPipeline:
    """Holds the parameter sets + jitted losses/steps.

    Usage::

        pipe = DMDPipeline(teacher_bundle, DMDConfig())
        state = pipe.init_state(tx_g, tx_f)
        fake_step, student_step = pipe.make_steps(tx_g, tx_f)
        for step in range(n):
            state, f_loss = fake_step(state, rng1, y)          # (+ x_real)
            if step % 2:   # e.g. 1:1 alternation
                state, s_loss = student_step(state, rng2, y)
        samples = pipe.generate(state.student_params, rng3, y)
    """

    def __init__(self, teacher: ModelBundle, cfg: Optional[DMDConfig] = None):
        self.cfg = cfg or DMDConfig()
        self.bundle = teacher
        self.module = teacher.module
        self.dit_cfg = teacher.module.cfg
        self.teacher_params = teacher.variables["params"]
        self.alphas = _alphas(self.cfg.num_timesteps)
        if self.cfg.parameterization not in ("eps", "rf"):
            raise ValueError("parameterization must be 'eps' or 'rf'")
        self._disc = FeatureDiscriminator(
            n_features=len(self.cfg.disc_features or (0,))
        )

    # -- parameterization ----------------------------------------------------
    def _coeffs(self, t):
        """(alpha, sigma) of the affine noising x_t = alpha x0 + sigma eps."""
        if self.cfg.parameterization == "rf":
            s = (t.astype(jnp.float32)
                 / (self.cfg.num_timesteps - 1))[:, None, None, None]
            return 1.0 - s, s
        a = jnp.take(self.alphas, t)[:, None, None, None]
        return jnp.sqrt(a), jnp.sqrt(1.0 - a)

    def _sample_t(self, rng, B):
        """Matching-loss timesteps: uniform ints (eps) or logit-normal on
        the same integer grid (rf — concentrates density mid-trajectory)."""
        if self.cfg.parameterization == "rf":
            z = (self.cfg.rf_t_mean
                 + self.cfg.rf_t_std * jax.random.normal(rng, (B,)))
            s = jax.nn.sigmoid(z)
            t = (s * (self.cfg.num_timesteps - 1)).astype(jnp.int32)
            return jnp.clip(t, self.cfg.t_min, self.cfg.t_max)
        return jax.random.randint(rng, (B,), self.cfg.t_min,
                                  self.cfg.t_max + 1)

    # -- model wrappers -----------------------------------------------------
    def _pred(self, params, x, t, y):
        variables = {**self.bundle.variables, "params": params}
        with self.bundle.contexts():
            return self.module.apply(
                variables, x.astype(self.dit_cfg.dtype), t, y
            ).astype(jnp.float32)

    def _x0(self, params, x_t, t, y):
        alpha, sigma = self._coeffs(t)
        pred = self._pred(params, x_t, t, y)
        if self.cfg.parameterization == "rf":
            return x_t - sigma * pred  # v-pred: x0 = x_t - sigma * v
        return (x_t - sigma * pred) / alpha

    def _pred_target(self, x0, noise):
        """What the score net regresses to under DSM."""
        if self.cfg.parameterization == "rf":
            return noise - x0  # velocity
        return noise

    def _features(self, params, x_t, t, y):
        """Selected DiT block outputs of the fake net (the DMD2
        discriminator backbone) via capture_intermediates."""
        variables = {**self.bundle.variables, "params": params}
        idx = self.cfg.disc_features or (self.dit_cfg.num_layers - 1,)
        names = {f"blocks_{i}" for i in idx}
        with self.bundle.contexts():
            _, state = self.module.apply(
                variables, x_t.astype(self.dit_cfg.dtype), t, y,
                capture_intermediates=lambda mdl, _: mdl.name in names,
                mutable=["intermediates"],
            )
        inter = state["intermediates"]
        return [inter[f"blocks_{i}"]["__call__"][0] for i in sorted(idx)]

    def generate(self, student_params, rng, y):
        """Few-step generation along ``step_schedule``: each step predicts
        x0, then re-noises stochastically to the next schedule point.
        Gradient flows through the FINAL step only (DMD2 backward
        simulation)."""
        cfg = self.dit_cfg
        B = y.shape[0]
        rng, r = jax.random.split(rng)
        x = jax.random.normal(
            r, (B, cfg.image_size, cfg.image_size, cfg.in_channels),
            jnp.float32,
        )
        sched = self.cfg.step_schedule
        for i, ti in enumerate(sched):
            t = jnp.full((B,), ti, jnp.int32)
            x0 = self._x0(student_params, x, t, y)
            if i + 1 < len(sched):
                x0 = jax.lax.stop_gradient(x0)
                rng, r = jax.random.split(rng)
                tn = jnp.full((B,), sched[i + 1], jnp.int32)
                alpha, sigma = self._coeffs(tn)
                x = alpha * x0 + sigma * jax.random.normal(r, x0.shape,
                                                           jnp.float32)
        return x0

    # -- losses ---------------------------------------------------------------
    def fake_score_loss(self, fake_params, student_params, rng, y):
        """Denoising score matching on the STUDENT's outputs (reference:
        compute_fake_score_loss — grads w.r.t. fake_params only)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        x0 = jax.lax.stop_gradient(self.generate(student_params, r1, y))
        t = self._sample_t(r2, y.shape[0])
        alpha, sigma = self._coeffs(t)
        noise = jax.random.normal(r3, x0.shape, jnp.float32)
        x_t = alpha * x0 + sigma * noise
        pred = self._pred(fake_params, x_t, t, y)
        return jnp.mean(jnp.square(pred - self._pred_target(x0, noise)))

    def disc_loss(self, fake_params, disc_params, student_params, rng, y,
                  x_real):
        """DMD2 discriminator update: separate noised REAL data from noised
        student samples, reading the fake net's features (both the head and
        the backbone take this gradient, as in the reference)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        x_fake = jax.lax.stop_gradient(self.generate(student_params, r1, y))
        t = self._sample_t(r2, y.shape[0])
        alpha, sigma = self._coeffs(t)
        noise = jax.random.normal(r3, x_real.shape, jnp.float32)
        xt_real = alpha * x_real + sigma * noise
        xt_fake = alpha * x_fake + sigma * noise
        lr = self._disc.apply(disc_params,
                              self._features(fake_params, xt_real, t, y))
        lf = self._disc.apply(disc_params,
                              self._features(fake_params, xt_fake, t, y))
        # non-saturating: real -> +inf, fake -> -inf
        return jnp.mean(jax.nn.softplus(-lr) + jax.nn.softplus(lf))

    def student_loss(self, student_params, fake_params, rng, y,
                     disc_params=None):
        """VSD / distribution-matching loss (+ optional DMD2 GAN term)
        (reference: compute_student_loss :458, vsd_loss)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        x0_s = self.generate(student_params, r1, y)
        t = self._sample_t(r2, y.shape[0])
        alpha, sigma = self._coeffs(t)
        noise = jax.random.normal(r3, x0_s.shape, jnp.float32)
        x_t = alpha * x0_s + sigma * noise
        teacher_x0 = jax.lax.stop_gradient(
            self._x0(self.teacher_params, x_t, t, y)
        )
        fake_x0 = jax.lax.stop_gradient(self._x0(fake_params, x_t, t, y))
        grad = fake_x0 - teacher_x0
        # per-sample normalizer (DMD2): keeps the gradient scale-invariant
        norm = jnp.mean(jnp.abs(x0_s - teacher_x0), axis=(1, 2, 3),
                        keepdims=True) + 1e-6
        target = jax.lax.stop_gradient(x0_s - self.cfg.vsd_weight * grad / norm)
        loss = 0.5 * jnp.mean(jnp.square(x0_s - target))
        if self.cfg.gan_weight > 0 and disc_params is not None:
            lf = self._disc.apply(
                jax.lax.stop_gradient(disc_params),
                self._features(jax.lax.stop_gradient(fake_params), x_t, t, y),
            )
            loss = loss + self.cfg.gan_weight * jnp.mean(jax.nn.softplus(-lf))
        return loss

    # -- training loop pieces -------------------------------------------------
    def init_state(self, tx_g, tx_f, rng=None, tx_d=None):
        student = jax.tree.map(jnp.copy, self.teacher_params)
        fake = jax.tree.map(jnp.copy, self.teacher_params)
        state = {
            "student_params": student,
            "fake_params": fake,
            "ema_params": jax.tree.map(jnp.copy, student),
            "g_opt": tx_g.init(student),
            "f_opt": tx_f.init(fake),
            "disc_params": None,
            "d_opt": None,
        }
        if self.cfg.gan_weight > 0:
            cfg = self.dit_cfg
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            x = jnp.zeros((1, cfg.image_size, cfg.image_size,
                           cfg.in_channels), jnp.float32)
            t = jnp.zeros((1,), jnp.int32)
            y = jnp.zeros((1,), jnp.int32)
            feats = jax.eval_shape(
                lambda p: self._features(p, x, t, y), fake
            )
            feats = [jnp.zeros(f.shape, jnp.float32) for f in feats]
            disc = self._disc.init(rng, feats)
            state["disc_params"] = disc
            state["d_opt"] = (tx_d or tx_f).init(disc)
        return state

    def make_steps(self, tx_g, tx_f, tx_d=None):
        """(fake_step, student_step) — both jitted, optimizers closed over;
        EMA folds into the student step (reference: fastgen/ema.py). With
        ``gan_weight > 0`` pass the real batch: fake_step(state, rng, y,
        x_real) also updates the discriminator (head + fake-net backbone,
        DMD2's joint update)."""
        import optax

        decay = self.cfg.ema_decay
        gan = self.cfg.gan_weight > 0
        tx_d = tx_d or tx_f

        @jax.jit
        def fake_step(state, rng, y, x_real=None):
            loss, grads = jax.value_and_grad(self.fake_score_loss)(
                state["fake_params"], state["student_params"], rng, y
            )
            updates, f_opt = tx_f.update(grads, state["f_opt"],
                                         state["fake_params"])
            fake = optax.apply_updates(state["fake_params"], updates)
            state = {**state, "fake_params": fake, "f_opt": f_opt}
            if gan and x_real is not None:
                (dl, (gf, gd)) = jax.value_and_grad(
                    lambda fp, dp: self.disc_loss(
                        fp, dp, state["student_params"], rng, y, x_real),
                    argnums=(0, 1), has_aux=False,
                )(state["fake_params"], state["disc_params"])
                du, d_opt = tx_d.update(gd, state["d_opt"],
                                        state["disc_params"])
                disc = optax.apply_updates(state["disc_params"], du)
                fu, f_opt = tx_f.update(gf, state["f_opt"],
                                        state["fake_params"])
                fake = optax.apply_updates(state["fake_params"], fu)
                loss = loss + dl
                state = {**state, "fake_params": fake, "f_opt": f_opt,
                         "disc_params": disc, "d_opt": d_opt}
            return state, loss

        @jax.jit
        def student_step(state, rng, y):
            loss, grads = jax.value_and_grad(self.student_loss)(
                state["student_params"], state["fake_params"], rng, y,
                disc_params=state["disc_params"],
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
