"""FastNAS-style CV dims for the vision tower: width/depth slicing of a
VisionTransformer (bare or inside a VLM).

Reference analogue: the CV half of FastNAS pruning (reference:
modelopt/torch/prune/fastnas.py operating on conv/linear CV nets). Dims:

  * ``vit_intermediate_size`` — MLP width, channels ranked by fc2 row
    magnitude (the tower usually has no calibration loader, so importance is
    weight-magnitude rather than activation-based);
  * ``vit_num_layers`` — tower depth; trailing blocks are dropped and the
    llava feature tap (select_layer) keeps its RELATIVE position.

Patch-conv kernel size is intentionally NOT searchable: in a ViT the patch
kernel is stride-coupled (kernel == stride == patch), so resizing it changes
the token grid — a different model, not a subnet.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..core.bundle import ModelBundle


def _ffn_keep_idx(layer: dict, new_i: int) -> np.ndarray:
    w = np.asarray(jax.device_get(layer["fc2"]["kernel"]), np.float32)
    score = np.linalg.norm(w, axis=1)  # [I]
    keep = np.argsort(-score)[:new_i]
    return np.sort(keep)


def _slice_vit_params(tower: dict, vcfg, new_i: int, new_l: int) -> dict:
    sel = vcfg.select_layer
    if sel is not None:
        sel_abs = vcfg.num_layers + sel if sel < 0 else sel
        used_old = sel_abs + 1
        new_sel_abs = new_l + sel if sel < 0 else min(sel, new_l - 1)
        if new_sel_abs < 0:
            raise ValueError(
                f"vit_num_layers={new_l} leaves no layer at tap {sel}"
            )
        used_new = new_sel_abs + 1
        if used_new > used_old:
            raise ValueError(
                f"tower params only cover {used_old} blocks (tap {sel}); "
                f"cannot grow to {used_new}"
            )
    else:
        used_new = new_l

    out = {k: v for k, v in tower.items() if not k.startswith("layers_")}
    for i in range(used_new):
        layer = dict(tower[f"layers_{i}"])
        if new_i < vcfg.intermediate_size:
            idx = _ffn_keep_idx(layer, new_i)
            fc1, fc2 = dict(layer["fc1"]), dict(layer["fc2"])
            fc1["kernel"] = fc1["kernel"][:, idx]
            if "bias" in fc1:
                fc1["bias"] = fc1["bias"][idx]
            fc2["kernel"] = fc2["kernel"][idx, :]
            layer["fc1"], layer["fc2"] = fc1, fc2
        out[f"layers_{i}"] = layer
    return out


def vit_prune(bundle: ModelBundle, constraints: dict) -> ModelBundle:
    """constraints: {"vit_intermediate_size": n, "vit_num_layers": n}
    (absolute targets). Works on VisionTransformer and VLM bundles."""
    from ..models.vit import ViTConfig, VisionTransformer  # noqa: F401
    from ..models.vlm import VLM, VLMConfig

    module = bundle.module
    is_vlm = isinstance(module, VLM)
    vcfg = module.cfg.vision if is_vlm else module.cfg
    new_i = constraints.get("vit_intermediate_size", vcfg.intermediate_size)
    new_l = constraints.get("vit_num_layers", vcfg.num_layers)
    assert new_i <= vcfg.intermediate_size and new_l <= vcfg.num_layers

    params = bundle.variables["params"]
    tower = params["vision_tower"] if is_vlm else params
    new_tower = _slice_vit_params(tower, vcfg, new_i, new_l)
    new_vcfg = dataclasses.replace(
        vcfg, intermediate_size=new_i, num_layers=new_l
    )
    if is_vlm:
        new_cfg = dataclasses.replace(module.cfg, vision=new_vcfg)
        new_params = {**params, "vision_tower": new_tower}
        new_module = VLM(new_cfg)
    else:
        new_params = new_tower
        new_module = VisionTransformer(new_vcfg)
    return bundle.replace(
        module=new_module,
        variables={**bundle.variables, "params": new_params},
    )
