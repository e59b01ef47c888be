"""QuantizerSpec — the static description of one quantizer.

This is the frozen/hashable counterpart of the reference's
``QuantizerAttributeConfig`` (reference: modelopt/torch/quantization/config.py:329).
Being hashable it can be closed over by ``jax.jit`` as static metadata; all
dynamic quantizer state (amax, pre_quant_scale, ...) lives in a separate
pytree (see quantizer.py), never on the spec.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Union

from .formats import FPFormat, parse_format

NumBits = Union[int, tuple, str]


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """Block-quantization layout.

    ``sizes`` maps (possibly negative) axis -> block size along that axis.
    ``dynamic`` selects on-the-fly per-block scales (no calibration) vs.
    calibrated static block scales. ``scale_bits``/``scale_format`` describe a
    second-level quantization of the block scales themselves (e.g. NVFP4's
    e4m3 block scales with an fp32 per-tensor scale)
    (reference: modelopt/torch/quantization/config.py block_sizes schema).
    """

    sizes: tuple  # tuple of (axis, size) pairs, sorted by axis
    dynamic: bool = True
    scale_format: Optional[str] = None  # e.g. "e4m3" or "e8m0"
    # second-level (per-tensor) scale kept in fp32 when scale_format is set
    two_level: bool = False
    # NVFP4 4/6: per block, choose the scale mapping block amax to 6 OR to 4
    # by lower MSE; e4m3 scale normalization bound drops to 256
    # (reference: config.py four_over_six key, numeric_utils.py E4M3_MAX_46)
    four_over_six: bool = False

    @staticmethod
    def from_dict(d: dict) -> "BlockSpec":
        sizes = tuple(sorted((int(k), int(v)) for k, v in d.items()
                             if isinstance(k, int) or (isinstance(k, str) and k.lstrip("-").isdigit())))
        return BlockSpec(
            sizes=sizes,
            dynamic=d.get("type", "dynamic") == "dynamic",
            scale_format=d.get("scale_format"),
            two_level=bool(d.get("two_level", d.get("scale_format") is not None)),
            four_over_six=bool(d.get("four_over_six", False)),
        )

    @property
    def sizes_dict(self) -> dict:
        return dict(self.sizes)


@dataclasses.dataclass(frozen=True)
class QuantizerSpec:
    """Static config of one tensor quantizer.

    Attributes mirror the reference's QuantizerAttributeConfig:
      num_bits:   int -> integer quant; (E, M) tuple or "eXmY" -> FP quant.
      axis:       dims kept (not reduced) when computing amax; None = per-tensor.
      block:      block layout (overrides axis), e.g. NVFP4 {-1: 16}.
      unsigned / narrow_range: integer-range options.
      enable:     disabled quantizers are identity.
      fake:       fake-quant (QAT/PTQ simulate) vs real compressed storage.
      bias_mode:  optional affine bias ("static_per_channel" etc.), or None.
      rotate:     apply a Hadamard rotation before quantization
                  (reference: config.py:289 RotateConfig).
      calibrator: "max" | "histogram" | "mse" — default stats collector.
    """

    num_bits: Any = 8
    axis: Optional[tuple] = None
    block: Optional[BlockSpec] = None
    unsigned: bool = False
    narrow_range: bool = False
    enable: bool = True
    fake: bool = True
    # dynamic=True: compute amax per call (no calibration) for non-block specs
    dynamic: bool = False
    bias_mode: Optional[str] = None
    rotate: bool = False
    calibrator: str = "max"
    # Learned scale (LSQ) — amax becomes trainable (reference: model_calib.py lsq)
    learn_amax: bool = False
    # Non-uniform code variant: "nf4" selects the 16-entry normal-float grid
    # (reference: qtensor/nf4_tensor.py); None = uniform int / IEEE-style fp
    variant: Optional[str] = None

    def __post_init__(self):
        if isinstance(self.num_bits, list):
            object.__setattr__(self, "num_bits", tuple(self.num_bits))
        if self.block is not None and not isinstance(self.block, BlockSpec):
            # accept raw {axis: size} mappings (user configs) anywhere a
            # BlockSpec is expected
            object.__setattr__(self, "block", BlockSpec.from_dict(dict(self.block)))
        if isinstance(self.axis, int):
            object.__setattr__(self, "axis", (self.axis,))
        elif isinstance(self.axis, list):
            object.__setattr__(self, "axis", tuple(self.axis))

    # -- format helpers ----------------------------------------------------
    @property
    def is_fp(self) -> bool:
        return not isinstance(self.num_bits, int)

    @property
    def fp_format(self) -> FPFormat:
        assert self.is_fp
        return parse_format(self.num_bits)

    @property
    def int_bound(self) -> int:
        assert not self.is_fp
        return 2 ** (self.num_bits - (0 if self.unsigned else 1)) - 1

    @property
    def maxval(self) -> float:
        """Largest representable magnitude at unit scale."""
        return float(self.fp_format.maxval) if self.is_fp else float(self.int_bound)

    @staticmethod
    def from_dict(d: Optional[dict]) -> "QuantizerSpec":
        if d is None:
            return QuantizerSpec(enable=False)
        d = dict(d)
        if "block_sizes" in d and d["block_sizes"] is not None:
            d["block"] = BlockSpec.from_dict(d.pop("block_sizes"))
        else:
            d.pop("block_sizes", None)
        nb = d.get("num_bits")
        if isinstance(nb, list):
            d["num_bits"] = tuple(nb)
        known = {f.name for f in dataclasses.fields(QuantizerSpec)}
        return QuantizerSpec(**{k: v for k, v in d.items() if k in known})

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        if self.block is not None:
            b = d.pop("block")
            d["block_sizes"] = {k: v for k, v in b["sizes"]}
            d["block_sizes"]["type"] = "dynamic" if b["dynamic"] else "static"
            if b["scale_format"]:
                d["block_sizes"]["scale_format"] = b["scale_format"]
                d["block_sizes"]["two_level"] = b["two_level"]
            if b["four_over_six"]:
                d["block_sizes"]["four_over_six"] = True
        else:
            d.pop("block")
        return d


DISABLED = QuantizerSpec(enable=False)
