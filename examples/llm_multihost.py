"""Multi-host QAT / pipeline-parallel training launch.

Run ONE copy per host (reference counterpart: the reference's multi-node
torchrun launches, e.g. examples/llm_qat's distributed training):

    # host 0                                  # host 1
    MODELOPT_COORD=host0:8476 \\              MODELOPT_COORD=host0:8476 \\
    MODELOPT_NUM_PROCS=2 \\                   MODELOPT_NUM_PROCS=2 \\
    MODELOPT_PROC_ID=0 \\                     MODELOPT_PROC_ID=1 \\
    python examples/llm_multihost.py          python examples/llm_multihost.py

On Cloud TPU pods set ``MODELOPT_COORD=auto`` — jax.distributed
auto-detects the pod topology. Local 2-process simulation on CPU:

    MODELOPT_SIM_CPU=1 MODELOPT_COORD=localhost:8476 MODELOPT_NUM_PROCS=2 \\
    MODELOPT_PROC_ID=<0|1> python examples/llm_multihost.py

Mesh policy (see parallel/multihost.py): dp and pp ride DCN (one gradient
reduction / one activation hop per step); tp rides ICI.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo-checkout import path

import argparse
import os


def main():
    if ("MODELOPT_PROC_ID" not in os.environ
            and "MODELOPT_COORD" not in os.environ):
        # (on a Cloud TPU pod, set MODELOPT_COORD=auto to use JAX's
        # pod auto-detection instead of the local simulation)
        # bare launch (no coordination configured): self-orchestrate the
        # 2-process CPU simulation so the example is runnable anywhere —
        # spawn two copies of this script wired together on a free port
        import socket
        import subprocess
        import sys

        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        env = {**os.environ, "MODELOPT_SIM_CPU": "1",
               "MODELOPT_COORD": f"localhost:{port}",
               "MODELOPT_NUM_PROCS": "2"}
        print(f"(no MODELOPT_COORD set: running the 2-process CPU "
              f"simulation on localhost:{port})")
        procs = [subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
            env={**env, "MODELOPT_PROC_ID": str(i)})
            for i in range(2)]
        rcs = [p.wait(timeout=560) for p in procs]
        sys.exit(max(rcs))

    if os.environ.get("MODELOPT_SIM_CPU"):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
        )
    import jax

    if os.environ.get("MODELOPT_SIM_CPU"):
        jax.config.update("jax_platforms", "cpu")

    # BEFORE any backend use
    from modelopt_tpu.parallel import initialize

    if os.environ.get("MODELOPT_COORD") == "auto":
        initialize(coordinator_address=None)
    else:
        initialize()

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import modelopt_tpu.quant as mtq
    from modelopt_tpu.core import ModelBundle
    from modelopt_tpu.models import Decoder, tiny_test_config
    from modelopt_tpu.parallel import hybrid_mesh, shard_variables
    from modelopt_tpu.utils import lm_cross_entropy

    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=None,
                    help="tensor-parallel width (default: local device count)")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    tp = args.tp or jax.local_device_count()
    dp = len(jax.devices()) // tp
    mesh = hybrid_mesh({"tp": tp}, {"dp": dp})
    if jax.process_index() == 0:
        print(f"processes={jax.process_count()} mesh=dp{dp}(DCN) x tp{tp}(ICI)")

    cfg = tiny_test_config(hidden_size=128, intermediate_size=256,
                           num_layers=4, vocab_size=1024)
    module = Decoder(cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (dp * 4, 32)),
        jnp.int32,
    )
    variables = module.init(jax.random.PRNGKey(0), ids)
    bundle = ModelBundle(module=module, variables=dict(variables),
                         example_inputs=(ids,))

    with mesh:
        bundle = bundle.replace(variables=shard_variables(bundle.variables, mesh))
        ids = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))
        # calibration reductions stay GSPMD-global across hosts — same
        # invariant the single-host tests pin, now over DCN
        q = mtq.quantize(bundle, mtq.NVFP4_DEFAULT_CFG, lambda f: f(ids))

        tx = optax.adamw(1e-4)
        params = q.variables["params"]
        rest = {k: v for k, v in q.variables.items() if k != "params"}
        opt_state = tx.init(params)
        apply_fn = q.make_fn()

        def loss_fn(params, ids):
            logits, _ = apply_fn({"params": params, **rest}, ids)
            return lm_cross_entropy(logits[:, :-1], ids[:, 1:])

        @jax.jit
        def step(params, opt_state, ids):
            loss, grads = jax.value_and_grad(loss_fn)(params, ids)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for i in range(args.steps):
            params, opt_state, loss = step(params, opt_state, ids)
            if jax.process_index() == 0:
                print(f"step {i}: loss {float(loss):.4f}")

    if jax.process_index() == 0:
        print("multi-host QAT OK")


if __name__ == "__main__":
    main()
