"""ModelBundle: the unit every optimization mode transforms.

Replaces the reference's in-place model mutation + ``ModeloptStateManager``
attribute (reference: modelopt/torch/opt/conversion.py:64) with an immutable
dataclass: (linen module, variables pytree, ordered mode records). Save and
restore are the same semantics as the reference's ``modelopt_state``/
``restore`` (conversion.py:445,650): serialize the record stack, replay it
onto a freshly built model, then load variables.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import json
import os
from typing import Any, Callable, Optional

import jax

from .mode import get_mode

# Phases a converted model can be applied in. Techniques interpret them;
# e.g. quantizers pass through and collect stats in CALIB, quantize in QUANT
# (reference: TensorQuantizer._if_calib/_if_quant flags,
#  nn/modules/tensor_quantizer.py:1119).
PHASE_QUANT = "quant"
PHASE_CALIB = "calib"
PHASE_CAPTURE = "capture"  # pass-through + sow quantizer inputs (algorithms)
PHASE_OFF = "off"

# Trace-time phase context — set by ModelBundle.contexts for every apply, so
# phase-aware submodules (TensorQuantizer) see it even on bundles with no
# quantize mode applied.
_PHASE_VAR = contextvars.ContextVar("opt_phase", default=PHASE_QUANT)


def current_phase() -> str:
    return _PHASE_VAR.get()


@contextlib.contextmanager
def _set_phase(phase: str):
    token = _PHASE_VAR.set(phase)
    try:
        yield
    finally:
        _PHASE_VAR.reset(token)


@dataclasses.dataclass(frozen=True)
class ModeRecord:
    mode: str
    config: Any
    metadata: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """A model plus its optimization state.

    module:         the linen module (static architecture).
    variables:      full variables pytree ({'params': ..., 'quant': ..., ...}).
    example_inputs: args tuple used for shape-dependent conversions and
                    data-free calibration passes.
    records:        ordered list of applied modes (the replayable state stack).
    metadata:       free-form model info (e.g. hf config dict) for export.
    """

    module: Any
    variables: dict
    example_inputs: tuple = ()
    records: tuple = ()
    metadata: dict = dataclasses.field(default_factory=dict)

    # -- functional application ------------------------------------------
    @contextlib.contextmanager
    def contexts(self, phase: str = PHASE_QUANT):
        """Enter every applied mode's runtime context (static, trace-time)."""
        with contextlib.ExitStack() as stack:
            stack.enter_context(_set_phase(phase))
            for rec in self.records:
                ctx = get_mode(rec.mode).runtime_context(rec.config, phase)
                if ctx is not None:
                    stack.enter_context(ctx)
            yield

    def apply(self, *args, phase: str = PHASE_QUANT, mutable=False, **kwargs):
        """Run the model with all mode contexts active. Safe under jit as long
        as the jitted callable is built per (records, phase) — use make_fn
        for cached jitted entry points."""
        with self.contexts(phase):
            return self.module.apply(self.variables, *args, mutable=mutable, **kwargs)

    def make_fn(self, phase: str = PHASE_QUANT, mutable=False) -> Callable:
        """Return a pure ``fn(variables, *args, **kwargs)`` with this bundle's
        mode contexts bound at trace time. Suitable for jax.jit / pjit: the
        closure identity keys the jit cache, so different phases/configs never
        collide in the compilation cache."""
        module, records = self.module, self.records

        def fn(variables, *args, **kwargs):
            with self.contexts(phase):
                return module.apply(variables, *args, mutable=mutable, **kwargs)

        return fn

    def replace(self, **kw) -> "ModelBundle":
        return dataclasses.replace(self, **kw)

    @property
    def params(self):
        return self.variables.get("params", {})


# --------------------------------------------------------------------------
# Mode application / state stack (reference: opt/conversion.py:343 apply_mode)
# --------------------------------------------------------------------------
def apply_mode(bundle: ModelBundle, mode, config=None) -> ModelBundle:
    """Apply one mode or a list of ``(mode, config)`` pairs, appending records."""
    if isinstance(mode, (list, tuple)) and mode and isinstance(mode[0], (list, tuple)):
        for m, cfg in mode:
            bundle = apply_mode(bundle, m, cfg)
        return bundle
    desc = get_mode(mode)
    if hasattr(desc, "canonicalize_config"):
        config = desc.canonicalize_config(config)
    for rec in bundle.records:
        prev = get_mode(rec.mode)
        if prev.next_prohibited_modes and mode in prev.next_prohibited_modes:
            raise ValueError(f"mode {mode!r} cannot follow {rec.mode!r}")
    new_bundle, metadata = desc.convert(bundle, config)
    rec = ModeRecord(mode=mode, config=config, metadata=metadata or {})
    return new_bundle.replace(records=(*new_bundle.records, rec))


def modelopt_state(bundle: ModelBundle) -> dict:
    """Serializable description of all applied modes
    (reference: opt/conversion.py:445)."""
    from .. import __version__

    return {
        "modelopt_state_dict": [
            {
                "mode": rec.mode,
                "config": get_mode(rec.mode).config_to_dict(rec.config),
                "metadata": rec.metadata,
            }
            for rec in bundle.records
        ],
        "modelopt_version": __version__,
    }


def restore_from_modelopt_state(bundle: ModelBundle, state: dict) -> ModelBundle:
    """Replay a serialized mode stack onto a fresh bundle
    (reference: opt/conversion.py:577)."""
    for entry in state["modelopt_state_dict"]:
        desc = get_mode(entry["mode"])
        config = desc.config_from_dict(entry["config"])
        new_bundle = desc.restore(bundle, config, entry["metadata"])
        rec = ModeRecord(entry["mode"], config, entry["metadata"])
        bundle = new_bundle.replace(records=(*new_bundle.records, rec))
    return bundle


# --------------------------------------------------------------------------
# Save / restore (reference: opt/conversion.py:495 save, :650 restore)
# --------------------------------------------------------------------------
def save(bundle: ModelBundle, path: str) -> None:
    """Write ``state.json`` (mode stack + metadata) and ``variables.msgpack``."""
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "state.json"), "w") as f:
        json.dump(
            {"modelopt": modelopt_state(bundle), "metadata": bundle.metadata}, f, indent=1
        )
    with open(os.path.join(path, "variables.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(bundle.variables))


def restore(bundle: ModelBundle, path: str) -> ModelBundle:
    """Replay the saved mode stack onto ``bundle`` and load its variables.

    ``bundle`` must be a freshly-initialized model of the same architecture
    (the reference has the same contract: restore into an unmodified model,
    conversion.py:650).
    """
    from flax import serialization

    with open(os.path.join(path, "state.json")) as f:
        payload = json.load(f)
    bundle = restore_from_modelopt_state(bundle, payload["modelopt"])

    with open(os.path.join(path, "variables.msgpack"), "rb") as f:
        data = f.read()
    # Variables created by modes (e.g. 'quant') may not exist in the fresh
    # bundle yet; materialize them by deserializing without a template first.
    raw = serialization.msgpack_restore(data)
    raw = jax.tree.map(lambda x: x, raw)  # plain dict of arrays

    _validate_restore(bundle.variables, raw)
    return bundle.replace(
        variables=raw, metadata=payload.get("metadata", bundle.metadata)
    )


def _validate_restore(template: dict, loaded: dict, max_errors: int = 12) -> None:
    """Diff the loaded variables against the replayed template and raise an
    actionable error on mismatch instead of exploding later at trace time
    with an opaque shape error (the reference validates equivalently by
    replaying module conversion, opt/conversion.py:650).

    Rules: every collection present in BOTH trees must agree on structure,
    shapes, and dtypes for shared paths; 'params' additionally must have no
    missing/unexpected leaves. Collections only present on one side are
    allowed (mode-created collections may be materialized lazily)."""
    from .tree import flatten_with_paths

    problems: list[str] = []
    for coll in sorted(set(template) | set(loaded)):
        if coll not in template or coll not in loaded:
            if coll == "params":
                side = "checkpoint" if coll not in loaded else "model"
                problems.append(f"'params' collection missing from the {side}")
            continue
        t = dict(flatten_with_paths(template[coll]))
        l = dict(flatten_with_paths(loaded[coll]))
        strict = coll == "params"
        if strict:
            for p in sorted(set(t) - set(l)):
                problems.append(f"missing from checkpoint: {coll}/{p} "
                                f"{tuple(t[p].shape)}")
            for p in sorted(set(l) - set(t)):
                problems.append(f"unexpected in checkpoint: {coll}/{p} "
                                f"{tuple(l[p].shape)}")
        for p in sorted(set(t) & set(l)):
            ts, ls = tuple(t[p].shape), tuple(l[p].shape)
            if ts != ls:
                problems.append(f"shape mismatch at {coll}/{p}: model {ts} "
                                f"vs checkpoint {ls}")
            elif t[p].dtype != l[p].dtype:
                problems.append(f"dtype mismatch at {coll}/{p}: model "
                                f"{t[p].dtype} vs checkpoint {l[p].dtype}")
        if len(problems) > max_errors:
            break
    if problems:
        shown = problems[:max_errors]
        more = len(problems) - len(shown)
        raise ValueError(
            "restore(): checkpoint does not match the model architecture/"
            "config:\n  " + "\n  ".join(shown)
            + (f"\n  ... and {more} more" if more > 0 else "")
            + "\nRestore into a freshly-initialized model of the SAME "
            "architecture the checkpoint was saved from."
        )
