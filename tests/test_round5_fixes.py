"""Round-5 regression tests: compile-cache env hook, int16 device
promotion, dryrun parity helpers."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from tpufeat import features
from tpufeat.config import KALDI39, MFCC13_HTK

from conftest import make_signal


class TestInt16Promotion:
    def test_extract_impl_promotes_int16_on_device(self):
        """features_impl promotes int16 -> f32/32768 as its first traced
        op (the compact-upload contract: int16 arenas give the same
        features as their exact f32 equivalents)."""
        sig = make_signal(12000, seed=42)
        q = np.round(sig * 32768.0).clip(-32768, 32767).astype(np.int16)
        f32 = q.astype(np.float32) / 32768.0
        lens = np.array([12000], np.int32)
        a = np.asarray(features.extract_impl(
            jnp.asarray(q)[None], jnp.asarray(lens), MFCC13_HTK).features)
        b = np.asarray(features.extract_impl(
            jnp.asarray(f32)[None], jnp.asarray(lens),
            MFCC13_HTK).features)
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_make_extractor_accepts_int16(self):
        sig = make_signal(8000, seed=43)
        q = np.round(sig * 32768.0).clip(-32768, 32767).astype(np.int16)
        fn = features.make_extractor(KALDI39)
        res = fn(q[None], np.array([8000], np.int32))
        assert res.features.shape[-1] == 39
        assert np.isfinite(np.asarray(res.features)).all()


@pytest.mark.slow  # subprocess jax import ~10 s; the hook is one config line
def test_compile_cache_env_hook(tmp_path):
    """TPUFEAT_COMPILE_CACHE at import wires jax_compilation_cache_dir
    and real cache entries land on disk (DEPLOY.md 'Cold starts')."""
    cache = str(tmp_path / "xlacache")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np, tpufeat\n"
        f"assert jax.config.jax_compilation_cache_dir == {cache!r}\n"
        "tpufeat.extract(np.zeros(8000, np.float32),"
        " cfg=tpufeat.MFCC13_HTK)\n"
        "import os; assert os.listdir(" + repr(cache) + "), 'no entries'\n"
        "print('OK')\n")
    env = dict(os.environ, TPUFEAT_COMPILE_CACHE=cache,
               JAX_PLATFORMS="cpu")
    env.pop("TPUFEAT_TEST_NO_CACHE", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=root,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0 and "OK" in out.stdout, (
        out.stdout + out.stderr)


def test_bucket_grid_plumbs_through(tmp_path):
    """Finer bucket grids shrink padding waste without changing outputs
    (upload bytes are the transfer-bound warm pass's dominant term)."""
    from tpufeat import io, pipeline
    d = tmp_path / "wavs"
    d.mkdir()
    for i, n in enumerate([16500, 21000, 26000, 31000]):
        io.write_wav(str(d / f"u{i}.wav"), make_signal(n, seed=i), 16000)
    runs, waste = {}, {}
    for grid in (2 ** 0.5, 2 ** 0.25):
        stats = {}
        runs[grid] = dict(pipeline.extract_corpus(
            str(d), MFCC13_HTK, batch_size=2, stats=stats,
            bucket_grid=grid))
        waste[grid] = stats["padding_waste"]
    assert waste[2 ** 0.25] < waste[2 ** 0.5]
    for k in runs[2 ** 0.5]:
        np.testing.assert_allclose(runs[2 ** 0.5][k], runs[2 ** 0.25][k],
                                   atol=2e-5)
