"""Tiny synthetic fixtures, mirroring the reference's toy nets
(reference: tests/_test_utils/torch/quantization/models.py:23-153)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from modelopt_tpu.core import ModelBundle
from modelopt_tpu.nn import QuantDense, RMSNorm


class SimpleMLP(nn.Module):
    hidden: int = 32
    out: int = 16

    @nn.compact
    def __call__(self, x):
        x = QuantDense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        x = QuantDense(self.hidden, name="fc2")(x)
        x = RMSNorm(name="norm")(x)
        x = QuantDense(self.out, name="lm_head")(x)
        return x


def simple_mlp_bundle(in_dim=16, batch=4, seed=0, **kw):
    m = SimpleMLP(**kw)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (batch, in_dim), jnp.float32)
    variables = m.init(jax.random.PRNGKey(seed), x)
    return ModelBundle(module=m, variables=dict(variables), example_inputs=(x,))
