"""mtsp.convert: attach a speculative-decoding mechanism as a mode
(reference: modelopt/torch/speculative/speculative_decoding.py:30 +
mode.py eagle/medusa descriptors)."""

from __future__ import annotations

import jax

from ..core.bundle import ModelBundle, apply_mode
from ..core.mode import ModeDescriptor, ModeRegistry
from .eagle import EagleConfig, EagleModel
from .medusa import MedusaConfig, MedusaModel

SpeculativeModeRegistry = ModeRegistry("speculative")


def _reinit_wrapper(bundle: ModelBundle, module, seed=0):
    """Initialize the wrapper module, grafting base params under 'base' and
    keeping any newly-created (draft) params from the fresh init."""
    ids = bundle.example_inputs[0]
    fresh = module.init(jax.random.PRNGKey(seed), ids, method=type(module).init_all)
    params = dict(fresh["params"])
    params["base"] = bundle.variables["params"]
    variables = {**bundle.variables, "params": params}
    # nest other collections the base may carry under 'base'
    for coll in ("quant", "sparse", "lora"):
        if coll in bundle.variables:
            variables[coll] = {"base": bundle.variables[coll]}
    return bundle.replace(module=module, variables=variables)


@SpeculativeModeRegistry.register
class EagleMode(ModeDescriptor):
    name = "eagle"

    def convert(self, bundle, config):
        if isinstance(config, dict):
            config = EagleConfig(**config)
        config = config or EagleConfig()
        module = EagleModel(bundle.module.cfg, config)
        return _reinit_wrapper(bundle, module), {}

    def config_from_dict(self, d):
        return EagleConfig(**(d or {}))

    def config_to_dict(self, c):
        return c.to_dict() if isinstance(c, EagleConfig) else dict(c or {})


@SpeculativeModeRegistry.register
class MedusaMode(ModeDescriptor):
    name = "medusa"

    def convert(self, bundle, config):
        if isinstance(config, dict):
            config = MedusaConfig(**config)
        config = config or MedusaConfig()
        module = MedusaModel(bundle.module.cfg, config)
        return _reinit_wrapper(bundle, module), {}

    def config_from_dict(self, d):
        return MedusaConfig(**(d or {}))

    def config_to_dict(self, c):
        return c.to_dict() if isinstance(c, MedusaConfig) else dict(c or {})


@SpeculativeModeRegistry.register
class DFlashMode(ModeDescriptor):
    name = "dflash"

    def convert(self, bundle, config):
        from .dflash import DFlashConfig, DFlashModel

        if isinstance(config, dict):
            config = DFlashConfig(**config)
        config = config or DFlashConfig()
        module = DFlashModel(bundle.module.cfg, config)
        return _reinit_wrapper(bundle, module), {}

    def config_from_dict(self, d):
        from .dflash import DFlashConfig

        return DFlashConfig(**(d or {}))

    def config_to_dict(self, c):
        from .dflash import DFlashConfig

        return c.to_dict() if isinstance(c, DFlashConfig) else dict(c or {})


def convert(bundle: ModelBundle, modes) -> ModelBundle:
    """mtsp.convert(model, [("eagle", cfg)]) (reference:
    speculative_decoding.py:30)."""
    return apply_mode(bundle, modes)
