"""The examples/ scripts must actually run (subprocess, forced CPU).

The sandbox's sitecustomize force-registers the axon TPU plugin in every
process (env JAX_PLATFORMS=cpu alone is overridden — see conftest.py), so
the subprocess bootstraps jax.config to CPU before running the script.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BOOTSTRAP = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "import runpy, sys; script = sys.argv[1]; sys.argv = sys.argv[1:]; "
    "runpy.run_path(script, run_name='__main__')"
)


@pytest.mark.parametrize("script", [
    "offline_corpus.py",
    "online_serving.py",
    "serving_pool.py",
    # ~27 s (CTC+RNN-T training loops); test_models covers the steps
    pytest.param("train_eval.py", marks=pytest.mark.slow),
    "speaker_id.py"])
def test_example_runs(script, tmp_path):
    args = [sys.executable, "-c", BOOTSTRAP,
            os.path.join(ROOT, "examples", script)]
    if script == "offline_corpus.py":
        args.append(str(tmp_path))
    out = subprocess.run(args, capture_output=True, text=True,
                         timeout=600, cwd=ROOT)
    assert out.returncode == 0, out.stdout + out.stderr
