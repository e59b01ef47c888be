"""Calibration-data machinery tests (reference analogue:
tests/unit/torch/utils/test_dataset_utils.py — batch-size auto-tune
:996, create_forward_loop :1183, chat/VLM batch prep)."""

import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.utils.dataset import (
    chat_template_batches,
    create_forward_loop,
    get_max_batch_size,
    vlm_calib_batches,
)


class TestMaxBatchSize:
    def test_halves_until_fit(self):
        # device "fits" at most 11 concurrent rows: cap 64 -> 8
        calls = []

        def try_batch(b):
            calls.append(b)
            return b <= 11

        assert get_max_batch_size(cap=64, _try_batch=try_batch) == 8
        assert calls == [64, 32, 16, 8]  # halving, no re-probes

    def test_floor_is_one(self):
        assert get_max_batch_size(cap=16, _try_batch=lambda b: False) == 1

    def test_real_forward_on_cpu(self):
        from tests._test_utils.models import simple_mlp_bundle

        bundle = simple_mlp_bundle(in_dim=16)
        # MLP takes [batch, features] float inputs — adapt via _try_batch
        import jax

        fn = jax.jit(bundle.make_fn())

        def try_batch(b):
            fn(bundle.variables, jnp.ones((b, 16), jnp.float32))
            return True

        assert get_max_batch_size(cap=8, _try_batch=try_batch) == 8


class TestForwardLoop:
    def test_single_array_batches(self):
        seen = []
        loop = create_forward_loop([np.zeros((2, 4)), np.ones((2, 4))])
        loop(lambda x: seen.append(x.shape))
        assert seen == [(2, 4), (2, 4)]

    def test_tuple_batches_unpack(self):
        seen = []
        loop = create_forward_loop([
            (np.zeros((2, 4), np.int32), np.zeros((2, 8, 8, 3))),
        ])
        loop(lambda ids, px: seen.append((ids.shape, px.shape)))
        assert seen == [((2, 4), (2, 8, 8, 3))]


class _ToyTokenizer:
    """Callable tokenizer without apply_chat_template."""

    def __call__(self, text):
        return {"input_ids": [ord(c) % 97 for c in text]}


class _ChatTokenizer(_ToyTokenizer):
    def __init__(self):
        self.template_calls = 0

    def apply_chat_template(self, conv, tokenize=True):
        self.template_calls += 1
        ids = []
        for m in conv:
            ids += [1] + [ord(c) % 97 for c in m["content"]] + [2]
        return ids


class TestChatTemplateBatches:
    CONVS = [
        [{"role": "user", "content": "hello there"},
         {"role": "assistant", "content": "hi"}],
        [{"role": "user", "content": "quantize my model please"}],
        [{"role": "user", "content": "x" * 100}],
        [{"role": "user", "content": "short"}],
    ]

    def test_uses_apply_chat_template(self):
        tok = _ChatTokenizer()
        out = chat_template_batches(self.CONVS, tok, batch_size=2, seq_len=32)
        assert tok.template_calls == 4
        assert len(out) == 2 and out[0].shape == (2, 32)

    def test_generic_template_fallback_pads_and_truncates(self):
        out = chat_template_batches(self.CONVS, _ToyTokenizer(),
                                    batch_size=2, seq_len=32, pad_id=0)
        assert all(b.shape == (2, 32) for b in out)
        # the 100-char conversation truncates; 'short' pads with 0
        assert int(np.asarray(out[1])[1, -1]) == 0

    def test_partial_final_batch_kept(self):
        # 3 conversations at batch_size 2: the trailing one must not be
        # silently dropped — the final batch pads by repeating the last row
        out = chat_template_batches(self.CONVS[:3], _ChatTokenizer(),
                                    batch_size=2, seq_len=32)
        assert len(out) == 2
        b = np.asarray(out[1])
        assert np.array_equal(b[0], b[1])  # padded by repetition

    def test_too_few_conversations_raises(self):
        with pytest.raises(ValueError, match="< one batch"):
            chat_template_batches(self.CONVS[:1], _ToyTokenizer(),
                                  batch_size=2, seq_len=16)


class TestVLMCalibBatches:
    def test_synthetic_from_config(self):
        from modelopt_tpu.models import tiny_vlm_config

        cfg = tiny_vlm_config()
        out = vlm_calib_batches(cfg, num_batches=3, batch_size=2, seq_len=16)
        assert len(out) == 3
        ids, px = out[0]
        assert ids.shape == (2, 16) and ids.dtype == jnp.int32
        assert px.shape == (2, cfg.vision.image_size, cfg.vision.image_size, 3)

    def test_feeds_vlm_through_forward_loop(self):
        import jax

        from modelopt_tpu.core import ModelBundle
        from modelopt_tpu.models import VLM, tiny_vlm_config
        import modelopt_tpu.quant as mtq

        cfg = tiny_vlm_config()
        m = VLM(cfg)
        batches = vlm_calib_batches(cfg, num_batches=2, batch_size=2,
                                    seq_len=8)
        ids, px = batches[0]
        variables = m.init(jax.random.PRNGKey(0), ids, px)
        bundle = ModelBundle(module=m, variables=dict(variables),
                             example_inputs=(ids, px))
        q = mtq.quantize(bundle, mtq.INT8_DEFAULT_CFG,
                         create_forward_loop(batches))
        amax = q.variables["quant"]
        assert amax  # calibration sowed quantizer state
