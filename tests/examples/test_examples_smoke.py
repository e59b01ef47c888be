"""Examples smoke tier (reference counterpart: tests/examples/): every
shipped example script must RUN — on CPU, at its tiny default
configuration — not just import. A fast representative subset runs in the
default suite; set MODELOPT_EXAMPLES_ALL=1 to sweep all of them."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# (script, extra args) — defaults are tiny models; keep each < ~2 min CPU
FAST = [
    ("llm_ptq.py", ["--preset", "FP8_DEFAULT_CFG", "--calib-batches", "2"]),
    ("pruning_minitron.py", ["--distill-steps", "5"]),
    ("speculative_decoding.py", ["--train-steps", "20", "--max-new", "16"]),
    ("llm_serve.py", ["--requests", "4", "--max-new", "8"]),
    ("llm_sparsity.py", ["--finetune-steps", "5"]),
    ("cnn_qat.py", ["--steps", "10", "--qat-steps", "5"]),
]
EXTRA = [
    ("llm_qat.py", []),
    ("llm_distill.py", []),
    ("llm_autoquant.py", []),
    ("llm_eval.py", []),
    ("diffusion_ptq.py", []),
    ("deepseek_ptq.py", []),
    ("gpt_oss_serve.py", []),
    ("minimax_mixed_ptq.py", []),
    ("model_hub_serve.py", []),
    ("puzzletron.py", []),
    ("vlm_ptq.py", []),
    ("vla_ptq.py", []),
    ("llm_multihost.py", []),
]

CASES = FAST + (EXTRA if os.environ.get("MODELOPT_EXAMPLES_ALL") == "1"
                else [])


def _run(script, args):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    # 8 virtual devices only where the example needs a mesh — splitting
    # the CPU threadpool 8 ways makes single-device examples ~10x slower
    if script in ("llm_multihost.py",):
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    else:
        env.pop("XLA_FLAGS", None)
    # this machine's sitecustomize overrides the JAX_PLATFORMS env var —
    # force CPU through jax.config (which wins) via a runpy launcher, or
    # the whole tier silently burns TPU-tunnel startup per example
    launcher = (
        "import jax, runpy, sys; "
        "jax.config.update('jax_platforms', 'cpu'); "
        "sys.argv = sys.argv[1:]; "
        "runpy.run_path(sys.argv[0], run_name='__main__')"
    )
    p = subprocess.run(
        [sys.executable, "-c", launcher,
         os.path.join(REPO, "examples", script), *args],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert p.returncode == 0, (
        f"{script} failed (rc={p.returncode})\n--- stdout ---\n"
        f"{p.stdout[-3000:]}\n--- stderr ---\n{p.stderr[-3000:]}")


@pytest.mark.parametrize("script,args", CASES,
                         ids=[c[0] for c in CASES])
def test_example_smoke(script, args):
    _run(script, args)
