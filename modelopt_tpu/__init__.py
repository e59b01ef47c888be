"""modelopt_tpu: a TPU-native model-optimization framework built from scratch in JAX.

Capability-parity target: NVIDIA Model-Optimizer (see SURVEY.md). The design is
idiomatic JAX rather than a port: optimization "modes" are pure, replayable
transforms over parameter pytrees + a sidecar quantizer-state collection, not
in-place nn.Module class swaps (reference: modelopt/torch/opt/dynamic.py).

Subpackage aliases mirror the reference's public namespaces
(reference: modelopt/torch/__init__.py):

    import modelopt_tpu.quant as mtq       # ~ modelopt.torch.quantization
    import modelopt_tpu.sparsity as mts    # ~ modelopt.torch.sparsity
    import modelopt_tpu.prune as mtp       # ~ modelopt.torch.prune
    import modelopt_tpu.distill as mtd     # ~ modelopt.torch.distill
    import modelopt_tpu.speculative as mtsp # ~ modelopt.torch.speculative
    import modelopt_tpu.peft as mtpf       # ~ modelopt.torch.peft
"""

__version__ = "0.1.0"
