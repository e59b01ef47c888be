"""Vision-language-action (VLA) quantization (reference: examples/alpamayo/).

The reference's alpamayo example quantizes a ~10B VLA driving model (camera
frames + egomotion in, chain-of-thought text + future trajectory out) to
FP8 / NVFP4 / mixed precision from a 16-clip calibration set. The TPU-native
analogue: a LLaVA-tower VLM backbone with a trajectory-regression head,
quantized through the same PTQ stack with a *mixed* config — NVFP4 language
decoder, FP8 vision tower + action head (the action head is tiny and
accuracy-critical, exactly the split alpamayo's mixed recipe makes).

Reports text-logit drift AND trajectory ADE (average displacement error,
the metric driving stacks actually gate on) between bf16 and quantized.

    python examples/vla_ptq.py                    # mixed NVFP4/FP8 (default)
    python examples/vla_ptq.py --preset FP8_DEFAULT_CFG
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class VLA(nn.Module):
    """VLM backbone + waypoint head: [B, horizon, 2] future trajectory
    regressed from the mean of the final hidden states (alpamayo decodes
    a trajectory token stream; a pooled regression head keeps the example
    self-contained while exercising the same quantization surface)."""

    vlm_cfg: object
    horizon: int = 8

    def setup(self):
        from modelopt_tpu.models.vlm import VLM
        from modelopt_tpu.nn import QuantDense

        tc = self.vlm_cfg.text
        self.vlm = VLM(self.vlm_cfg)
        self.action_in = QuantDense(tc.hidden_size, use_bias=True,
                                    dtype=tc.dtype, param_dtype=tc.param_dtype,
                                    name="action_in")
        self.action_out = QuantDense(self.horizon * 2, use_bias=True,
                                     dtype=tc.dtype, param_dtype=tc.param_dtype,
                                     name="action_out")

    def __call__(self, input_ids, pixel_values):
        logits, _, hidden = self.vlm(input_ids, pixel_values,
                                     output_hidden=True)
        pooled = jnp.mean(hidden, axis=1)
        traj = self.action_out(nn.tanh(self.action_in(pooled)))
        B = traj.shape[0]
        return logits, traj.reshape(B, self.horizon, 2)


def mixed_vla_config():
    """NVFP4 decoder weights, FP8 vision tower + projector, action head
    kept FP8 too (alpamayo's mixed checkpoint holds the trajectory path at
    higher precision than the LM experts)."""
    import modelopt_tpu.quant as mtq

    cfg = dict(mtq.NVFP4_DEFAULT_CFG)
    rules = dict(cfg["quant_cfg"])
    # rule merging is update-based: explicitly clear NVFP4's block_sizes so
    # the override is plain per-tensor FP8, not "FP8 with NVFP4 blocks"
    fp8 = {"num_bits": (4, 3), "axis": None, "block_sizes": None}
    for tower in ("*vision_tower*", "*linear_1*", "*linear_2*", "*action_*"):
        rules[tower + "weight_quantizer"] = dict(fp8)
        rules[tower + "input_quantizer"] = dict(fp8)
    cfg["quant_cfg"] = rules
    return cfg


def main():
    import modelopt_tpu.quant as mtq
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models.vlm import tiny_vlm_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mixed",
                    help="'mixed' (NVFP4 LM + FP8 vision/action) or a "
                         "preset name, e.g. FP8_DEFAULT_CFG")
    ap.add_argument("--calib-batches", type=int, default=8)
    ap.add_argument("--horizon", type=int, default=8)
    args = ap.parse_args()

    vlm_cfg = tiny_vlm_config(dtype=jnp.bfloat16)
    model = VLA(vlm_cfg, horizon=args.horizon)
    vocab = vlm_cfg.text.vocab_size
    img = vlm_cfg.vision.image_size

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, vocab, (2, 16)), jnp.int32)
    px = jnp.asarray(rng.normal(size=(2, img, img, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ids, px)
    bundle = ModelBundle(module=model, variables=dict(variables),
                         example_inputs=(ids, px))

    def forward_loop(model_fn):
        for _ in range(args.calib_batches):
            i = jnp.asarray(rng.integers(0, vocab, (2, 16)), jnp.int32)
            p = jnp.asarray(rng.normal(size=(2, img, img, 3)), jnp.float32)
            model_fn(i, p)

    cfg = mixed_vla_config() if args.preset == "mixed" \
        else getattr(mtq, args.preset)
    qb = mtq.quantize(bundle, cfg, forward_loop)
    mtq.print_quant_summary(qb)

    ref_logits, ref_traj = jax.jit(bundle.make_fn())(bundle.variables, ids, px)
    q_logits, q_traj = jax.jit(qb.make_fn())(qb.variables, ids, px)
    rel = float(
        jnp.linalg.norm(q_logits.astype(jnp.float32)
                        - ref_logits.astype(jnp.float32))
        / jnp.linalg.norm(ref_logits.astype(jnp.float32))
    )
    ade = float(jnp.mean(jnp.linalg.norm(
        q_traj.astype(jnp.float32) - ref_traj.astype(jnp.float32), axis=-1)))
    label = "mixed NVFP4-LM/FP8-vision" if args.preset == "mixed" \
        else args.preset
    print(f"{label}: text-logit rel err {rel:.4f}, trajectory ADE {ade:.5f} "
          f"(vision tower, projector, decoder, action head all quantized)")


if __name__ == "__main__":
    main()
