"""CNN INT8 quantization-aware training (reference: examples/cnn_qat/).

The reference finetunes a torchvision ResNet with INT8 fake-quant. Here: a
small conv net built from QuantConv/QuantDense (same layers the LLM stack
uses — the quantizer points are architecture-agnostic), trained on
synthetic image classification, then PTQ'd to INT8 and QAT-recovered.

    python examples/cnn_qat.py --steps 60
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class SmallCNN(nn.Module):
    """Conv tower + classifier head, all quantizable."""

    num_classes: int = 10
    width: int = 32

    @nn.compact
    def __call__(self, x):
        from modelopt_tpu.nn import QuantConv, QuantDense

        for i, ch in enumerate((self.width, self.width * 2, self.width * 4)):
            x = QuantConv(features=ch, kernel_size=(3, 3), name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return QuantDense(features=self.num_classes, name="head")(x)


def synthetic_image_batches(num, batch, size=32, classes=10, seed=0):
    """Class-conditional gaussian blobs: learnable but nontrivial. The
    class prototypes are fixed (seed 0) so train/test share the task;
    ``seed`` only varies the sampled noise and labels."""
    protos = np.random.default_rng(0).normal(
        size=(classes, size, size, 3)
    ).astype(np.float32)
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        y = rng.integers(0, classes, size=(batch,))
        x = protos[y] + 0.5 * rng.normal(size=(batch, size, size, 3)).astype(np.float32)
        out.append((jnp.asarray(x), jnp.asarray(y)))
    return out


def accuracy(apply_fn, variables, batches):
    correct = total = 0
    for x, y in batches:
        pred = jnp.argmax(apply_fn(variables, x), axis=-1)
        correct += int(jnp.sum(pred == y))
        total += y.shape[0]
    return correct / total


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.core import PHASE_QUANT, ModelBundle

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--qat-steps", type=int, default=30)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--preset", default="INT8_DEFAULT_CFG")
    args = ap.parse_args()

    model = SmallCNN()
    train = synthetic_image_batches(args.steps, 32)
    test = synthetic_image_batches(8, 32, seed=1)
    x0 = train[0][0]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    bundle = ModelBundle(module=model, variables=dict(variables), example_inputs=(x0,))

    # 1) float pretrain
    tx = optax.adamw(args.lr)

    def make_step(apply_fn):
        @jax.jit
        def step(params, rest, opt, x, y):
            def loss(p):
                logits = apply_fn({**rest, "params": p}, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y
                ).mean()

            l, g = jax.value_and_grad(loss)(params)
            upd, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, upd), opt, l
        return step

    params = bundle.variables["params"]
    opt = tx.init(params)
    step = make_step(bundle.make_fn())
    for x, y in train:
        params, opt, _ = step(params, {}, opt, x, y)
    bundle = bundle.replace(variables={**bundle.variables, "params": params})
    fp_acc = accuracy(jax.jit(bundle.make_fn()), bundle.variables, test)

    # 2) PTQ to INT8 (max calibration over a few batches)
    q = mtq.quantize(bundle, args.preset, lambda f: [f(x) for x, _ in train[:4]])
    q_apply = jax.jit(q.make_fn(phase=PHASE_QUANT))
    ptq_acc = accuracy(q_apply, q.variables, test)

    # 3) QAT recovery: train through the fake-quant STEs
    params = q.variables["params"]
    rest = {k: v for k, v in q.variables.items() if k != "params"}
    opt = tx.init(params)
    qstep = make_step(q.make_fn(phase=PHASE_QUANT))
    for x, y in train[: args.qat_steps]:
        params, opt, _ = qstep(params, rest, opt, x, y)
    qat_vars = {**q.variables, "params": params}
    qat_acc = accuracy(q_apply, qat_vars, test)

    print(f"accuracy: bf16={fp_acc:.3f}  INT8 PTQ={ptq_acc:.3f}  "
          f"INT8 QAT={qat_acc:.3f}")


if __name__ == "__main__":
    main()
