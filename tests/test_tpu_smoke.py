"""On-chip smoke suite. Skipped in the default CPU run; execute with

    TPUFEAT_TEST_TPU=1 python -m pytest tests/test_tpu_smoke.py -q

to validate every accelerated path on real hardware (one process — the
relay allows a single TPU client at a time; see BASELINE.md timing notes).
"""

import dataclasses
import os

import numpy as np
import pytest

import jax

from tpufeat import features
from tpufeat.config import KALDI39, MFCC13_HTK, WHISPER80
from tpufeat.reference import cpu

from conftest import make_signal

pytestmark = pytest.mark.skipif(
    os.environ.get("TPUFEAT_TEST_TPU") != "1"
    or jax.default_backend() != "tpu",
    reason="set TPUFEAT_TEST_TPU=1 on a TPU host")

VARIANTS = [
    dict(),                                                  # XLA rfft
    dict(use_pallas=True),                                   # pallas tail
    dict(use_pallas=True, gemm_dft=True),                    # staged gemm
    dict(use_pallas=True, gemm_dft=True, fused_framing=True),  # signal kernel
]


@pytest.mark.parametrize("preset", [MFCC13_HTK, WHISPER80, KALDI39])
@pytest.mark.parametrize("variant", range(len(VARIANTS)))
def test_variant_golden_parity(preset, variant):
    cfg = dataclasses.replace(preset, **VARIANTS[variant])
    sig = make_signal(16000, seed=variant)
    res = features.extract(sig, cfg=cfg)
    gold = cpu.extract(sig.astype(np.float64), preset)
    err = np.abs(np.asarray(res.features) - gold).max()
    assert err < 2e-3, f"variant {VARIANTS[variant]}: {err}"
