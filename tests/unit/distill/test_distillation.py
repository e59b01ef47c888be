"""Distillation mode: kd_loss record, combined CE+KD loss with feature
pairs, export_student, save/restore of the mode stack (reference:
tests/unit/torch/distill/)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import modelopt_tpu.distill as mtd
from modelopt_tpu.core import ModelBundle
from modelopt_tpu.models import Decoder, tiny_test_config


@pytest.fixture(scope="module")
def pair():
    tcfg = tiny_test_config()
    tmod = Decoder(tcfg)
    ids = jnp.zeros((2, 16), jnp.int32)
    tvars = jax.jit(tmod.init)(jax.random.PRNGKey(0), ids)
    teacher = ModelBundle(module=tmod, variables=dict(tvars),
                          example_inputs=(ids,))
    scfg = dataclasses.replace(tcfg, num_layers=1)
    smod = Decoder(scfg)
    svars = jax.jit(smod.init)(jax.random.PRNGKey(1), ids)
    student = ModelBundle(module=smod, variables=dict(svars),
                          example_inputs=(ids,))
    return teacher, student


def test_kd_loss_decreases_and_feature_pairs(pair):
    teacher, student = pair
    cfg = mtd.DistillConfig(teacher=teacher, temperature=2.0, kd_weight=0.5,
                            layer_pairs=(("layers_0", "layers_1"),))
    student = mtd.convert(student, cfg)
    assert student.records[-1].mode == "kd_loss"
    loss_fn = mtd.make_kd_loss_fn(student, cfg)
    tx = optax.adam(1e-3)
    params = student.variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch):
        l, g = jax.value_and_grad(loss_fn)(params, batch)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, l

    batch = jax.random.randint(jax.random.PRNGKey(2), (4, 16), 0, 256)
    losses = []
    for _ in range(8):
        params, opt, l = step(params, opt, batch)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_export_student_drops_records(pair):
    teacher, student = pair
    student = mtd.convert(student, mtd.DistillConfig(teacher=teacher))
    final = mtd.export_student(student)
    assert all(r.mode != "kd_loss" for r in final.records)
    # kd_weight balancing: weight 0 means pure task CE
    cfg0 = mtd.DistillConfig(teacher=teacher, kd_weight=0.0)
    loss0 = mtd.make_kd_loss_fn(mtd.convert(student, cfg0), cfg0)
    cfg1 = mtd.DistillConfig(teacher=teacher, kd_weight=1.0)
    loss1 = mtd.make_kd_loss_fn(mtd.convert(student, cfg1), cfg1)
    b = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 256)
    assert not np.isclose(float(loss0(student.variables["params"], b)),
                          float(loss1(student.variables["params"], b)))


def test_kd_mode_survives_save_restore(pair, tmp_path):
    from modelopt_tpu.core import restore, save

    teacher, student = pair
    student = mtd.convert(student, mtd.DistillConfig(teacher=teacher,
                                                     temperature=3.0))
    save(student, str(tmp_path / "kd"))
    template = ModelBundle(module=student.module,
                           variables=student.variables,
                           example_inputs=student.example_inputs)
    loaded = restore(template, str(tmp_path / "kd"))
    rec = [r for r in loaded.records if r.mode == "kd_loss"][-1]
    cfgd = rec.config if isinstance(rec.config, dict) else rec.config.to_dict()
    assert float(cfgd["temperature"]) == 3.0
