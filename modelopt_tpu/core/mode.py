"""Mode descriptors and registries.

A *mode* is a named, configurable, replayable model transform
(reference: modelopt/torch/opt/mode.py:56 ModeDescriptor,
:277 _ModeRegistryCls). Examples: "quantize", "kd_loss", "sparse_magnitude",
"eagle". Each technique package owns a registry; all registries share a
global name index so a state stack can be replayed without knowing which
package a mode came from.
"""

from __future__ import annotations

from typing import Any, Callable, Optional


class ModeDescriptor:
    """Interface of one mode.

    Subclasses define:
      name:          unique mode name.
      convert:       (bundle, config) -> (bundle, metadata). Pure.
      restore:       (bundle, config, metadata) -> bundle. Defaults to
                     replaying convert (exact for pure transforms).
      runtime_context: optional contextmanager active while a converted
                     bundle is applied (e.g. "quantize" activates its config
                     so quantizer submodules resolve specs).
      config_from_dict / config_to_dict: (de)serialization of the config.
    """

    name: str = ""

    def convert(self, bundle, config):
        raise NotImplementedError

    def restore(self, bundle, config, metadata):
        new_bundle, _ = self.convert(bundle, config)
        return new_bundle

    def runtime_context(self, config, phase):
        return None  # no-op; ModelBundle skips None contexts

    def config_from_dict(self, d: dict) -> Any:
        return d

    def config_to_dict(self, config: Any) -> dict:
        return config if isinstance(config, dict) else config.to_dict()

    # Mode-chaining compatibility DAG (reference: mode.py next_modes)
    next_prohibited_modes: Optional[frozenset] = None


class ModeRegistry:
    """Per-technique mode registry with a shared global index
    (reference: opt/mode.py:277 _ModeRegistryCls)."""

    _global: dict[str, "ModeDescriptor"] = {}

    def __init__(self, technique: str):
        self.technique = technique
        self._modes: dict[str, ModeDescriptor] = {}

    def register(self, descriptor_cls: Callable[[], ModeDescriptor]):
        desc = descriptor_cls() if isinstance(descriptor_cls, type) else descriptor_cls
        if not desc.name:
            raise ValueError(f"mode descriptor {desc} has no name")
        if desc.name in ModeRegistry._global:
            raise ValueError(f"mode {desc.name!r} already registered")
        self._modes[desc.name] = desc
        ModeRegistry._global[desc.name] = desc
        return descriptor_cls

    def __contains__(self, name):
        return name in self._modes

    def __getitem__(self, name):
        return self._modes[name]


def get_mode(name: str) -> ModeDescriptor:
    try:
        return ModeRegistry._global[name]
    except KeyError:
        raise KeyError(
            f"Unknown mode {name!r}. Registered: {sorted(ModeRegistry._global)}"
        ) from None
