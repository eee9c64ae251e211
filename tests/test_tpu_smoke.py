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
import jax.numpy as jnp

from tpufeat import features, sharding, streaming
from tpufeat.config import FeatureConfig, KALDI39, MFCC13_HTK, WHISPER80
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
FUSED = VARIANTS[3]


def golden_err(sig, cfg, golden_cfg=None):
    res = features.extract(sig, cfg=cfg)
    gold = cpu.extract(sig.astype(np.float64), golden_cfg or cfg)
    return np.abs(np.asarray(res.features) - gold).max()


@pytest.mark.parametrize("preset", [MFCC13_HTK, WHISPER80, KALDI39])
@pytest.mark.parametrize("variant", range(len(VARIANTS)))
def test_variant_golden_parity(preset, variant):
    cfg = dataclasses.replace(preset, **VARIANTS[variant])
    sig = make_signal(16000, seed=variant)
    res = features.extract(sig, cfg=cfg)
    gold = cpu.extract(sig.astype(np.float64), preset)
    err = np.abs(np.asarray(res.features) - gold).max()
    assert err < 2e-3, f"variant {VARIANTS[variant]}: {err}"


class TestKernelV5OnChip:
    """Phase-packed layout (kernel v5) engages at >= 32*H frames, so the
    1 s signals above exercise the v4 fallback; these 3 s inputs validate
    the v5 path itself on hardware."""

    LONG = 3 * 16000

    @pytest.mark.parametrize("precision", ["highest", "bf16x3"])
    @pytest.mark.parametrize("preset", [MFCC13_HTK, WHISPER80, KALDI39])
    def test_phase_golden_parity(self, preset, precision):
        from tpufeat.pallas import fused
        cfg = dataclasses.replace(preset, matmul_precision=precision,
                                  **FUSED)
        assert fused._use_phase_layout(cfg, cfg.num_frames(self.LONG))
        sig = make_signal(self.LONG, seed=50)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64), preset)
        err = np.abs(np.asarray(res.features) - gold).max()
        assert err < 2e-3, f"v5 {precision}: {err}"

    def test_phase_kaldi_fold(self):
        base = FeatureConfig(kaldi_mode=True, dc_offset=True,
                             preemphasis=0.97, window="povey")
        cfg = dataclasses.replace(base, **FUSED)
        assert golden_err(make_signal(self.LONG, seed=51), cfg, base) < 2e-3

    def test_delta_split_matches_single_program(self):
        """extract() runs large delta configs as two programs
        (features._split_worthwhile); on chip the split output must agree
        with the single-program extract_impl to float32 scheduling noise."""
        cfg = dataclasses.replace(KALDI39, matmul_precision="bf16x3",
                                  **FUSED)
        B, n = 44, 30 * 16000            # 44 x 2998 frames: over the gate
        rng = np.random.default_rng(53)
        x = (rng.standard_normal((B, n)) * 0.1).astype(np.float32)
        lens = np.full((B,), n, np.int32)
        assert features._split_worthwhile(cfg, x.shape)
        split = features.extract(x, lens, cfg)           # two programs
        one = jax.jit(features.extract_impl,
                      static_argnames=("cfg",))(x, lens, cfg)
        assert np.abs(np.asarray(split.features)
                      - np.asarray(one.features)).max() < 1e-4

    def test_phase_matches_v4_on_chip(self, monkeypatch):
        from tpufeat import framing
        from tpufeat.pallas import fused
        cfg = dataclasses.replace(WHISPER80, matmul_precision="bf16x3",
                                  **FUSED)
        sig = make_signal(self.LONG, seed=52)
        F = cfg.num_frames(self.LONG)
        buf, _ = framing.framing_buffer(
            jnp.asarray(sig)[None], jnp.array([self.LONG]), cfg)
        a = np.asarray(fused.signal_features(buf, F, cfg))
        monkeypatch.setattr(fused, "_use_phase_layout", lambda c, n: False)
        b = np.asarray(fused.signal_features(buf, F, cfg))
        assert np.abs(a - b).max() < 2e-4


@pytest.mark.parametrize("preset", [MFCC13_HTK, WHISPER80, KALDI39])
def test_bf16x3_production_parity(preset):
    """The bench/production precision on hardware: fused signal kernel at
    the explicit 3-pass bf16 decomposition stays inside the 1e-3 budget."""
    cfg = dataclasses.replace(preset, matmul_precision="bf16x3", **FUSED)
    sig = make_signal(16000, seed=42)
    res = features.extract(sig, cfg=cfg)
    gold = cpu.extract(sig.astype(np.float64), preset)
    err = np.abs(np.asarray(res.features) - gold).max()
    assert err < 1e-3, f"bf16x3 {preset}: {err}"


class TestKernelCorners:
    def test_kaldi_mode_fused_signal_kernel(self):
        base = FeatureConfig(kaldi_mode=True, dc_offset=True,
                             preemphasis=0.97, window="povey",
                             deltas=True, cmvn="mean")
        cfg = dataclasses.replace(base, **FUSED)
        assert golden_err(make_signal(16000, seed=20), cfg, base) < 2e-3

    def test_kaldi_mode_staged_kernel(self):
        base = FeatureConfig(kaldi_mode=True, dc_offset=True,
                             preemphasis=0.97)
        cfg = dataclasses.replace(base, use_pallas=True, gemm_dft=True)
        assert golden_err(make_signal(16000, seed=21), cfg, base) < 2e-3

    def test_use_energy_fused(self):
        base = FeatureConfig(use_energy=True)
        cfg = dataclasses.replace(base, **FUSED)
        assert golden_err(make_signal(16000, seed=22), cfg, base) < 2e-3

    def test_use_energy_kaldi(self):
        base = FeatureConfig(kaldi_mode=True, dc_offset=True,
                             use_energy=True)
        cfg = dataclasses.replace(base, **FUSED)
        assert golden_err(make_signal(16000, seed=23), cfg, base) < 2e-3

    def test_magnitude_fused(self):
        base = FeatureConfig(spectrum="magnitude", lifter=22)
        cfg = dataclasses.replace(base, **FUSED)
        assert golden_err(make_signal(16000, seed=24), cfg, base) < 2e-3

    def test_whisper_mfcc_fused(self):
        base = dataclasses.replace(WHISPER80, n_mfcc=13)
        cfg = dataclasses.replace(base, **FUSED)
        assert golden_err(make_signal(16000, seed=25), cfg, base) < 2e-3

    def test_bf16_output(self):
        cfg = dataclasses.replace(WHISPER80, out_dtype="bfloat16", **FUSED)
        sig = make_signal(16000, seed=26)
        res = features.extract(sig, cfg=cfg)
        assert res.features.dtype == jnp.bfloat16
        gold = cpu.extract(sig.astype(np.float64), WHISPER80)
        err = np.abs(np.asarray(res.features, np.float32) - gold).max()
        assert err < 0.02      # bf16 quantization of ~[-1, 1] outputs

    def test_short_utterance_centered_batch(self):
        long = make_signal(4000, seed=27)
        short = make_signal(350, seed=28)
        x = np.full((2, 4000), 5.5, np.float32)
        x[0] = long
        x[1, :350] = short
        res = features.extract(x, np.array([4000, 350]),
                               dataclasses.replace(WHISPER80, **FUSED))
        for b, s in enumerate([long, short]):
            gold = cpu.extract(s.astype(np.float64), WHISPER80)
            got = np.asarray(res.features)[b, : gold.shape[0]]
            assert np.abs(got - gold).max() < 2e-3


class TestStreamingOnChip:
    def _run_plan(self, sig, cfg, plan):
        fe = streaming.StreamingFrontend(cfg, batch_size=1)
        outs, pos = [], 0
        for c in plan:
            f, _ = fe.process(sig[None, pos: pos + c])
            pos += c
            outs.append(np.asarray(f[0]))
        return np.concatenate(outs, 0)

    def test_cross_plan_bitwise(self):
        """The strict configs[3] contract on hardware: hop-aligned chunk
        plans are mutually bit-identical (MXU per-row invariance) — except
        single-frame steps, where XLA:TPU picks a different small-M matmul
        strategy (measured ~2e-6, same class as the CPU quirk; gated)."""
        sig = make_signal(16000, seed=30)
        a = self._run_plan(sig, MFCC13_HTK, [1600] * 10)
        b = self._run_plan(sig, MFCC13_HTK, [4800, 1600, 1600, 8000])
        c = self._run_plan(sig, MFCC13_HTK, [160] * 40 + [9600])
        np.testing.assert_array_equal(a, b)
        assert np.abs(a - c).max() < 1e-5      # 1-frame steps: small-M quirk

    def test_large_chunk_plan_bitwise(self):
        """A >= 128-frame chunk (over the kernel-v5 dispatch threshold)
        must stay bitwise equal to a small-chunk plan on hardware: the
        streaming step pins the v4 layout, and the v4 kernel's per-row
        arithmetic is block-size-invariant on the MXU."""
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        n = 51200                              # 318 frames in one step
        sig = make_signal(n, seed=38)
        big = self._run_plan(sig, cfg, [n])
        small = self._run_plan(sig, cfg, [3200] * (n // 3200))
        np.testing.assert_array_equal(big, small)

    def test_extract_scan_bitwise(self):
        sig = make_signal(16000, seed=30)
        a = self._run_plan(sig, MFCC13_HTK, [1600] * 10)
        es = np.asarray(streaming.extract_scan(sig, MFCC13_HTK, 1600))
        np.testing.assert_array_equal(es, a)

    def test_fused_streaming_matches_oneshot(self):
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        sig = make_signal(16000, seed=31)
        got = self._run_plan(sig, cfg, [1600] * 10)
        one = np.asarray(features.extract(sig, cfg=cfg).features)
        assert np.abs(got - one).max() < 1e-4

    def test_kaldi_fused_streaming(self):
        base = FeatureConfig(kaldi_mode=True, dc_offset=True)
        cfg = dataclasses.replace(base, **FUSED)
        sig = make_signal(8000, seed=32)
        got = self._run_plan(sig, cfg, [1600] * 5)
        one = np.asarray(features.extract(sig, cfg=cfg).features)
        assert np.abs(got - one).max() < 1e-4


class TestLargeBatchErratum:
    """Regression guard for the upstream XLA:TPU miscompilation
    (BASELINE.md): [256, 480000]-shaped pipelines corrupted ~8% of
    frames until round 5 bisected the trigger to the shift-then-subtract
    pre-emphasis op structure and rewrote framing.preemphasize in the
    clean compute-then-concat form (bitwise-identical values; every
    previously-corrupt envelope point re-measured clean at max|d|=0).
    This is now a HARD pass: a failure means either an upstream
    regression or a tpufeat restructure reintroduced the trigger —
    both must be caught loudly, not xfail-muted. The standalone
    upstream reproducer (trigger formulation) lives in
    benchmarks/experiments/erratum_repro.py."""

    def test_b256_30s_integrity(self):
        rng = np.random.default_rng(0)
        n = 30 * 16000
        sig = (rng.standard_normal((256, n)) * 0.1).astype(np.float32)
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        # single_program=True: the raw one-dispatch path this tracker
        # exists to probe — plain extract() now auto-routes around it
        res = features.extract(sig, np.full((256,), n, np.int32), cfg,
                               single_program=True)
        gold = cpu.extract(sig[0].astype(np.float64), MFCC13_HTK)
        err = np.abs(np.asarray(res.features[0]) - gold).max()
        assert err < 2e-3, f"B=256 erratum still present: {err}"

    def test_default_extract_guarded_at_b256(self):
        """Round-3 guard (VERDICT item 1): plain extract() at the erratum
        shape must return golden-parity features — the auto-router splits
        the batch into validated-envelope dispatches."""
        rng = np.random.default_rng(0)
        n = 30 * 16000
        sig = (rng.standard_normal((256, n)) * 0.1).astype(np.float32)
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        res = features.extract(sig, np.full((256,), n, np.int32), cfg)
        for b in (0, 255):
            gold = cpu.extract(sig[b].astype(np.float64), MFCC13_HTK)
            err = np.abs(np.asarray(res.features[b]) - gold).max()
            assert err < 2e-3, f"guarded extract() wrong at row {b}: {err}"

    def test_extract_chunked_is_safe(self):
        """The documented workaround: 128-row dispatches are exact."""
        rng = np.random.default_rng(0)
        n = 30 * 16000
        sig = (rng.standard_normal((256, n)) * 0.1).astype(np.float32)
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        res = features.extract_chunked(sig, np.full((256,), n, np.int32),
                                       cfg, rows_per_dispatch=128)
        gold = cpu.extract(sig[0].astype(np.float64), MFCC13_HTK)
        err = np.abs(np.asarray(res.features[0]) - gold).max()
        assert err < 2e-3, err


class TestShardingDegenerate:
    """1-device-mesh twins must agree with the local path on hardware."""

    def test_time_sharded_single_device(self):
        n = sharding.shardable_length(32000, MFCC13_HTK, 1)
        sig = make_signal(n, seed=33)
        got = np.asarray(sharding.extract_time_sharded(sig, MFCC13_HTK))
        want = np.asarray(features.extract(sig, cfg=MFCC13_HTK).features)
        assert np.abs(got - want).max() < 2e-5

    def test_data_parallel_single_device(self):
        x = np.stack([make_signal(16000, seed=s) for s in (34, 35)])
        lens = np.full((2,), 16000, np.int32)
        got = sharding.extract_data_parallel(x, lens, MFCC13_HTK)
        want = features.extract(x, lens, MFCC13_HTK)
        assert np.abs(np.asarray(got.features)
                      - np.asarray(want.features)).max() < 2e-5


class TestAuxOnChip:
    """Round-3 sideways growth of the on-chip matrix (VERDICT item 9):
    resampling, interchange formats, the corpus pipeline, the composed
    online pipeline, the fused sharded body, and augmentation — all on
    hardware, not just the CPU mesh."""

    def test_plp_fused_golden_parity(self):
        """PLP (beyond-reference family) on the production fused kernel +
        production matmul precision: hardware output vs the float64
        golden.

        Tolerance note (tpufeat/plp.py "Conditioning"): LPC deconvolution
        amplifies input-spectrum error by the per-frame Toeplitz condition
        number, so PLP — unlike the log-compressed MFCC path — cannot
        absorb TPU default matmul precision: f32 matmuls run one bf16
        pass by default on this chip, and at default precision this test
        measures 3.3e-2 worst-frame / 3.7e-3 median. That is a precision
        *configuration* penalty, not an f32 floor: on the exact same
        signals the CPU f32 path sits at 2.9e-6 max / 1.5e-7 median vs
        the f64 golden. Production flags pin matmul_precision="bf16x3"
        (CLAUDE.md), which restores near-f32 matmuls; budgets below are
        the bf16x3 floor with margin."""
        from tpufeat.config import PLP13
        cfg = dataclasses.replace(PLP13, matmul_precision="bf16x3",
                                  **FUSED)
        for sig in (make_signal(32000, seed=305),
                    (0.1 * np.random.default_rng(305)
                     .standard_normal(32000)).astype(np.float32)):
            got = np.asarray(features.extract(sig, cfg=cfg).features)
            want = cpu.plp(sig.astype(np.float64), PLP13)
            assert got.shape == want.shape
            d = np.abs(got - want)
            assert d.max() < 5e-3, d.max()
            assert np.median(d) < 2e-4, np.median(d)

    def test_plp_deltas_cmvn_on_chip(self):
        from tpufeat.config import PLP13
        cfg = dataclasses.replace(PLP13, deltas=True, cmvn="mean",
                                  matmul_precision="bf16x3", **FUSED)
        rng = np.random.default_rng(306)
        sig = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        got = np.asarray(features.extract(sig, cfg=cfg).features)
        want = cpu.extract(sig.astype(np.float64), dataclasses.replace(
            PLP13, deltas=True, cmvn="mean"))
        assert got.shape == want.shape == (98, 39)
        d = np.abs(got - want)
        assert d.max() < 5e-3, d.max()        # bf16x3 budget, see above
        assert np.median(d) < 2e-4, np.median(d)

    def test_pitch_tracker_on_chip(self):
        """NCCF + Viterbi pitch on hardware: a 150 Hz tone tracks to its
        quantized lag and matches the float64 golden path."""
        from tpufeat import pitch as pitchmod
        from tpufeat.reference import cpu as cpu_ref
        sr = 16000
        t = np.arange(12000) / sr
        sig = (0.3 * np.sin(2 * np.pi * 150.0 * t)
               + 0.02 * np.random.default_rng(307).standard_normal(12000)
               ).astype(np.float32)
        hz, pov, valid = pitchmod.track(sig)
        v = np.asarray(valid)
        assert abs(np.median(np.asarray(hz)[v]) - 150.0) < 3.0
        ghz, _ = cpu_ref.pitch(sig.astype(np.float64),
                               pitchmod.PitchConfig())
        F = int(v.sum())
        # rtol 1e-5 >> the >=2% lag-grid spacing => identical Viterbi
        # decisions; the slack absorbs f32-vs-f64 parabolic deltas
        np.testing.assert_allclose(np.asarray(hz)[:F], ghz[:F], rtol=1e-5)

    def test_streaming_pitch_on_chip(self):
        """Online lookahead-K pitch on hardware: full-lookahead flush ==
        offline Viterbi, exactly (ballast=0 removes the one documented
        running-RMS divergence)."""
        from tpufeat import pitch as pitchmod
        cfg = pitchmod.PitchConfig(ballast=0.0)
        sr = 16000
        t = np.arange(9600) / sr
        sig = (0.3 * np.sin(2 * np.pi * 170.0 * t)
               + 0.02 * np.random.default_rng(308).standard_normal(9600)
               ).astype(np.float32)
        F = cfg.num_frames(len(sig))
        want_hz, want_pov, _ = pitchmod.track(sig, cfg=cfg)
        sp = pitchmod.StreamingPitch(cfg, batch_size=1, lookahead=F + 2)
        for i in range(0, len(sig), 3200):
            sp.process(sig[None, i: i + 3200])
        hz, pov = sp.flush()
        np.testing.assert_allclose(np.asarray(hz)[0],
                                   np.asarray(want_hz)[:F], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pov)[0],
                                   np.asarray(want_pov)[:F],
                                   rtol=0, atol=1e-5)

    def test_resample_8k_to_16k_parity(self):
        import math
        import scipy.signal
        from tpufeat import resampling
        sig = make_signal(8137, seed=301)
        got = np.asarray(resampling.resample(sig, 8000, 16000))
        want = scipy.signal.resample_poly(sig.astype(np.float64), 2, 1)
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() / scale < 2e-5

    def test_resample_44k1_to_16k_parity(self):
        import scipy.signal
        from tpufeat import resampling
        sig = make_signal(44100 // 2, seed=302)
        got = np.asarray(resampling.resample(sig, 44100, 16000))
        want = scipy.signal.resample_poly(sig.astype(np.float64), 160, 441)
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() / scale < 2e-5

    def test_feats_io_round_trip_on_chip(self, tmp_path):
        """On-chip fused features -> HTK + ark files -> read back exact
        (f32 -> big-endian f32 -> f32 is lossless)."""
        from tpufeat import feats_io
        cfg = dataclasses.replace(KALDI39, **FUSED)
        sig = make_signal(16000, seed=303)
        feats = np.asarray(features.extract(sig, cfg=cfg).features)
        htk = str(tmp_path / "u.htk")
        feats_io.write_htk(htk, feats_io.to_htk_order(feats, 13),
                           kind=feats_io.parm_kind(
                               feats_io.HTK_MFCC, "0", "D", "A", "Z"))
        got, shift, _ = feats_io.read_htk(htk)
        np.testing.assert_array_equal(
            feats_io.from_htk_order(got, 13), feats)
        ark = str(tmp_path / "u.ark")
        feats_io.write_kaldi_ark(ark, {"u": feats})
        np.testing.assert_array_equal(
            feats_io.read_kaldi_ark(ark)["u"], feats)

    def test_corpus_pipeline_fused_on_chip(self, tmp_path):
        """extract_corpus with production flags on hardware: output
        matches direct extract per file; stats populated."""
        from tpufeat import io as tio, pipeline
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        d = tmp_path / "wavs"
        d.mkdir()
        lens = [16000, 9000, 23999, 12000, 16000, 7001]
        for i, n in enumerate(lens):
            tio.write_wav(str(d / f"u{i}.wav"),
                          make_signal(n, seed=310 + i), 16000)
        stats = {}
        got = dict(pipeline.extract_corpus(str(d), cfg, batch_size=3,
                                           stats=stats))
        assert len(got) == len(lens)
        assert stats["device_s"] > 0 and stats["n_programs"] >= 2
        for i, n in enumerate(lens):
            x, _ = tio.read_wav(str(d / f"u{i}.wav"))
            want = np.asarray(features.extract(x, cfg=cfg).features)
            np.testing.assert_allclose(got[str(d / f"u{i}.wav")], want,
                                       atol=2e-5)

    def test_corpus_resample_on_chip(self, tmp_path):
        """Rate-heterogeneous corpus with --resample on hardware: on-chip
        batched polyphase + fused extraction vs per-file oracle."""
        from tpufeat import io as tio, pipeline, resampling
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        d = tmp_path / "wavs"
        d.mkdir()
        rates = {"a.wav": 16000, "b.wav": 8000, "c.wav": 48000}
        for i, (name, r) in enumerate(rates.items()):
            tio.write_wav(str(d / name), make_signal(r, seed=330 + i), r)
        got = {p.split("/")[-1]: f for p, f in pipeline.extract_corpus(
            str(d), cfg, batch_size=2, resample=True)}
        for name, r in rates.items():
            x, _ = tio.read_wav(str(d / name))
            x16 = resampling.resample(x, r, 16000)
            want = np.asarray(features.extract(x16, cfg=cfg).features)
            np.testing.assert_allclose(got[name], want, atol=2e-5)

    def test_streaming_pipeline_online39_on_chip(self):
        """The composed online config-3 pipeline on hardware vs offline."""
        cfg = dataclasses.replace(KALDI39, cmvn="none", **FUSED)
        x = (np.random.default_rng(320).standard_normal((2, 24000))
             * 0.1).astype(np.float32)
        pipe = streaming.StreamingPipeline(cfg, batch_size=2)
        outs = [np.asarray(pipe.process(x[:, p: p + 4800]))
                for p in range(0, 24000, 4800)]
        outs.append(np.asarray(pipe.flush()))
        got = np.concatenate(outs, axis=1)
        want = np.asarray(features.extract(x, cfg=cfg).features)
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 5e-4   # bf16x3 cross-path noise

    def test_fused_time_sharded_one_device(self):
        """The production-kernel shard body (round-3 VERDICT item 2) on
        hardware — 1-device mesh degenerate, must match one-shot."""
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        mesh = sharding.default_mesh("time", jax.devices()[:1])
        n = sharding.shardable_length(4 * 16000, cfg, 1)
        sig = make_signal(n, seed=321)
        got = np.asarray(sharding.extract_time_sharded(sig, cfg, mesh=mesh))
        want = np.asarray(features.extract(sig, cfg=cfg).features)
        assert np.abs(got - want).max() < 2e-5

    def test_spec_augment_on_chip(self):
        from tpufeat import augment
        cfg = dataclasses.replace(MFCC13_HTK, **FUSED)
        x = np.stack([make_signal(16000, seed=330),
                      make_signal(16000, seed=331)])
        res = features.extract(x, cfg=cfg)
        aug = augment.spec_augment(res.features, res.num_frames,
                                   jax.random.key(0))
        a, f = np.asarray(aug), np.asarray(res.features)
        assert a.shape == f.shape
        assert not np.array_equal(a, f)          # masks applied
        changed = np.any(a != f, axis=-1)
        nf = np.asarray(res.num_frames)
        for b in range(2):                        # never beyond valid frames
            assert not changed[b, nf[b]:].any()

    def test_energy_vad_on_chip(self):
        from tpufeat import augment
        sil = np.zeros(8000, np.float32)
        speech = make_signal(8000, seed=332)
        x = np.concatenate([sil, speech])[None]
        mask = np.asarray(augment.energy_vad(x, np.array([16000])))
        F = MFCC13_HTK.num_frames(16000)
        assert mask.shape == (1, F)
        assert mask[0, 60:].mean() > 0.5          # speech half active
        assert mask[0, :40].mean() < 0.2          # silence half quiet

    @pytest.mark.parametrize("warp", [0.9, 1.1])
    def test_vtln_fused_golden_parity(self, warp):
        """VTLN-warped filterbank constants through the FUSED signal
        kernel on hardware (the warp reshapes the folded [K, n_mels]
        matrix, so kernel padding/layout must survive it)."""
        cfg = dataclasses.replace(MFCC13_HTK, vtln_warp=warp, **FUSED)
        sig = make_signal(16000, seed=333)
        assert golden_err(sig, cfg) < 2e-3

    def test_vtln_plp_fused_on_chip(self):
        from tpufeat.config import PLP13
        cfg = dataclasses.replace(PLP13, vtln_warp=1.08, **FUSED)
        sig = make_signal(16000, seed=334)
        res = features.extract(sig, cfg=cfg)
        gold = cpu.extract(sig.astype(np.float64),
                           dataclasses.replace(PLP13, vtln_warp=1.08))
        assert np.abs(np.asarray(res.features) - gold).max() < 5e-3

    def test_pitch_centered_grid_on_chip(self):
        """config_for(WHISPER80): centered pitch on the whisper grid —
        decisions match the (centered) f64 golden on chip."""
        from tpufeat import pitch
        pc = pitch.config_for(WHISPER80)
        assert pc.center
        t = np.arange(16000) / 16000.0
        sig = (0.3 * np.sin(2 * np.pi * 150.0 * t)
               + 0.03 * np.sin(2 * np.pi * 300.0 * t)).astype(np.float32)
        hz, pov, valid = pitch.track(sig, cfg=pc)
        ghz, gpov = cpu.pitch(sig.astype(np.float64), pc)
        strong = gpov > 0.5
        assert strong.sum() > 20
        np.testing.assert_allclose(np.asarray(hz)[strong], ghz[strong],
                                   rtol=1e-6)
        # centered grid: 1 + N//hop frames (whisper drops its last frame,
        # so the spectral count is one less; the CLI truncates to min)
        assert len(ghz) == 1 + 16000 // pc.hop_length
        assert WHISPER80.num_frames(16000) == len(ghz) - 1

    def test_sliding_cmvn_fused_golden_parity(self):
        """cfg.cmvn='sliding' through the production fused kernel on
        hardware vs the f64 golden (the windowed normalization online
        ASR deploys — Kaldi apply-cmvn-sliding semantics)."""
        cfg = dataclasses.replace(KALDI39, cmvn="sliding-meanvar",
                                  cmvn_window=150, cmvn_min_window=40,
                                  matmul_precision="bf16x3", **FUSED)
        sig = make_signal(32000, seed=340)
        assert golden_err(sig, cfg) < 2e-3

    def test_delta_order3_fused_golden_parity(self):
        """cfg.delta_order=3 (52-dim, HTK _T) through the production
        fused kernel on hardware vs the f64 golden."""
        cfg = dataclasses.replace(KALDI39, delta_order=3,
                                  matmul_precision="bf16x3", **FUSED)
        sig = make_signal(24000, seed=345)
        assert golden_err(sig, cfg) < 2e-3

    def test_add_noise_snr_on_chip(self):
        """Target-SNR mixing on hardware: the achieved SNR over valid
        samples is the oracle by definition (f32 accumulation on chip
        must hold it to ~1e-3 dB), padding untouched."""
        from tpufeat.augment import add_noise
        rng = np.random.default_rng(360)
        x = rng.standard_normal((4, 32000)).astype(np.float32)
        v = rng.standard_normal((4, 32000)).astype(np.float32)
        lens = np.asarray([32000, 24000, 16000, 32000])
        y = np.asarray(add_noise(x, v, lens, 12.0))
        d = y - x
        m = np.arange(32000) < lens[:, None]
        snr = 10 * np.log10((x * x * m).sum(1) / (d * d * m).sum(1))
        np.testing.assert_allclose(snr, 12.0, atol=1e-2)
        assert (d[1, 24000:] == 0).all()

    def test_streaming_resampler_on_chip(self):
        """Online polyphase on hardware: ragged 48k->16k chunk plan +
        flush vs the offline resampler (same-chip oracle)."""
        from tpufeat.resampling import StreamingResampler, resample
        rng = np.random.default_rng(363)
        x = (0.3 * rng.standard_normal((2, 48000))).astype(np.float32)
        want = np.asarray(resample(x, 48000, 16000))
        sr = StreamingResampler(48000, 16000, batch_size=2)
        outs, i = [], 0
        for step in [4800, 333, 9600, 48000]:
            step = min(step, 48000 - i)
            outs.append(np.asarray(sr.process(x[:, i:i + step])))
            i += step
        outs.append(np.asarray(sr.flush()))
        got = np.concatenate(outs, axis=1)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_add_reverb_on_chip(self):
        """RIR convolution on hardware: the rFFT-multiply path vs the
        float64 np.convolve golden (same shift/crop/normalize), padding
        zeroed, power preserved."""
        from tpufeat.augment import add_reverb
        rng = np.random.default_rng(362)
        x = rng.standard_normal((2, 32000)).astype(np.float32)
        lens = np.asarray([32000, 24000])
        h = (rng.standard_normal((2, 400))
             * np.exp(-np.arange(400) / 60.0)).astype(np.float32)
        h[:, :4] = 0.0
        h[np.arange(2), [4, 11]] = 3.0
        y = np.asarray(add_reverb(x, h, lens))
        ref = np.zeros_like(y, dtype=np.float64)
        for b in range(2):
            xm = np.where(np.arange(32000) < lens[b], x[b], 0.0)
            full = np.convolve(xm.astype(np.float64),
                               h[b].astype(np.float64))
            d = int(np.argmax(np.abs(h[b])))
            yy = np.where(np.arange(32000) < lens[b],
                          full[d:d + 32000], 0.0)
            ref[b] = yy * np.sqrt((xm * xm).sum() / (yy * yy).sum())
        assert np.max(np.abs(y - ref)) < 2e-3 * np.abs(ref).max()
        assert (y[1, 24000:] == 0).all()

    def test_streaming_vad_on_chip(self):
        """Online VAD on hardware: chunked decisions == one-chunk
        decisions (cummax determinism holds on the TPU relay)."""
        from tpufeat.augment import StreamingEnergyVAD
        x = 0.001 * np.random.default_rng(361).standard_normal(
            16000).astype(np.float32)
        x[:4000] += 0.5
        one = StreamingEnergyVAD()
        ref = np.asarray(one.process(x[None]))
        many = StreamingEnergyVAD()
        got = np.concatenate([np.asarray(many.process(x[None, i:i + 1600]))
                              for i in range(0, 16000, 1600)], axis=1)
        np.testing.assert_array_equal(got, ref)
        assert ref[:, :20].all() and not ref[:, 30:].any()

    def test_compat_shim_fused_on_chip(self):
        """tpufeat.compat.WhisperFeatureExtractor constructed ON TPU
        engages the fused kernels + bf16x3 — parity vs the plain
        WHISPER80 highest-precision extract within the bf16x3 budget."""
        from tpufeat.compat import WhisperFeatureExtractor
        fe = WhisperFeatureExtractor()
        assert fe.config.use_pallas and fe.config.fused_framing
        sig = make_signal(16000 * 3, seed=350)
        out = fe([sig], sampling_rate=16000, return_attention_mask=True)
        assert out.input_features.shape == (1, 80, 3000)
        want = features.extract(
            np.pad(sig, (0, 16000 * 27)), cfg=WHISPER80).features
        err = np.abs(out.input_features[0].T - np.asarray(want)).max()
        assert err < 2e-3, err
        assert out.attention_mask.sum() == WHISPER80.num_frames(len(sig))

    def test_streaming_sliding_cmvn_on_chip(self):
        """StreamingPipeline(cmvn='sliding') == offline extract() on
        hardware (finite trailing windows -> exact online normalization,
        modulo f32 sum order + the delta chain's 1-ulp FMA noise)."""
        cfg = dataclasses.replace(KALDI39, cmvn="sliding",
                                  cmvn_window=120, cmvn_min_window=30)
        sig = make_signal(32000, seed=341)
        want = features.extract(sig, cfg=cfg)
        nf = int(np.asarray(want.num_frames))
        sp = streaming.StreamingPipeline(cfg, batch_size=1)
        outs = [sp.process(sig[None, i: i + 4800])
                for i in range(0, 32000, 4800)]
        outs.append(sp.flush())
        got = np.concatenate([np.asarray(o[0]) for o in outs], axis=0)
        assert got.shape[0] == nf
        np.testing.assert_allclose(got, np.asarray(want.features)[:nf],
                                   atol=1e-4, rtol=0)

    def test_spectrogram_feats_on_chip(self):
        """spec257 (compute-spectrogram-feats analogue) runs the XLA path
        on hardware — golden parity incl. the energy element (raw
        spectrum bins sit closer to the log floor than mel sums, hence
        the wider budget; see test_spectrogram_feats.py)."""
        from tpufeat.config import SPEC257
        sig = make_signal(24000, seed=360)
        assert golden_err(sig, SPEC257) < 5e-3
        classic = FeatureConfig(n_mels=0, n_mfcc=0, gemm_dft=True)
        assert golden_err(sig, classic) < 5e-3

    def test_fbank_energy_fused_on_chip(self):
        """fbank + prepended energy column through the fused signal
        kernel (dim n_mels+1, Kaldi compute-fbank-feats --use-energy)."""
        cfg = dataclasses.replace(FeatureConfig(n_mfcc=0, n_mels=26,
                                                use_energy=True), **FUSED)
        sig = make_signal(3 * 16000, seed=361)     # v5 layout territory
        res = features.extract(sig, cfg=cfg)
        assert np.asarray(res.features).shape[-1] == 27
        assert golden_err(sig, cfg) < 2e-3

    def test_online_cmvn_on_chip(self):
        """Kaldi online2 OnlineCmvn on hardware: the offline op over
        fused-kernel features vs the f64 golden, and the streaming twin
        through StreamingPipeline(online_cmvn=...) vs the offline
        composition (same-chip oracle)."""
        from tpufeat import data
        cfg = dataclasses.replace(KALDI39, cmvn="none",
                                  matmul_precision="bf16x3", **FUSED)
        sig = make_signal(32000, seed=363)
        feats = features.extract(sig, cfg=cfg).features
        spk_rows = np.random.default_rng(364).standard_normal((80, 39))
        spk = data.CmvnStats(39)
        spk.accumulate(spk_rows)
        got = np.asarray(features.online_cmvn(
            feats, window=120, speaker_stats=spk, norm_vars=True))
        want = cpu.online_cmvn(np.asarray(feats, np.float64), window=120,
                               speaker_stats=spk, norm_vars=True)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)

        oc = streaming.OnlineCmvn(39, window=120, speaker_stats=spk,
                                  norm_vars=True)
        pipe = streaming.StreamingPipeline(cfg, batch_size=1,
                                           online_cmvn=oc)
        outs = [np.asarray(pipe.process(sig[None, i: i + 8000]))
                for i in range(0, 32000, 8000)]
        outs.append(np.asarray(pipe.flush()))
        stream = np.concatenate(outs, axis=1)[0]
        np.testing.assert_allclose(stream, want[: len(stream)],
                                   atol=5e-4, rtol=0)

    def test_slot_recycle_on_chip(self):
        """reset_rows + StreamPool on hardware through the production
        fused streaming step: recycling slot 0 leaves slot 1 bit-
        unchanged, and the recycled slot is bit-exact vs the zeros-prefix
        oracle after warmup (the serving utterance-turnover contract)."""
        cfg = dataclasses.replace(KALDI39, cmvn="none",
                                  matmul_precision="bf16x3", **FUSED)
        b, plan = 2, [4800] * 4
        rng = np.random.default_rng(365)
        x = (0.1 * rng.standard_normal((b, sum(plan)))).astype(np.float32)

        def run(pipe, sig, reset_at=None):
            outs, pos = [], 0
            for i, c in enumerate(plan):
                outs.append(np.asarray(pipe.process(sig[:, pos: pos + c])))
                pos += c
                if reset_at is not None and i == reset_at:
                    pipe.reset_rows([0])
            return np.concatenate(outs, axis=1)

        ref = run(streaming.StreamingPipeline(cfg, batch_size=b), x)
        pipe = streaming.StreamingPipeline(cfg, batch_size=b)
        got = run(pipe, x, reset_at=1)
        np.testing.assert_array_equal(got[1], ref[1])
        xz = x.copy()
        xz[0, :9600] = 0.0
        oracle = run(streaming.StreamingPipeline(cfg, batch_size=b), xz)
        r0 = MFCC13_HTK.num_frames(9600) + pipe.warmup_rows
        np.testing.assert_array_equal(got[0, r0:], oracle[0, r0:])

        pool = streaming.StreamPool(
            streaming.StreamingPipeline(cfg, batch_size=b))
        s0, s1 = pool.attach(), pool.attach()
        out = pool.process({s0: x[0, :4800], s1: x[1, :4800]})
        n = MFCC13_HTK.num_frames(4800) - 4
        assert np.asarray(out[s0]).shape[0] == max(0, n - pool.warmup)
        # block(): the zero-dispatch bulk path agrees with per-slot slicing
        blk, skips = out.block()
        host = np.asarray(blk)
        for s in out:
            np.testing.assert_array_equal(np.asarray(out[s]),
                                          host[s, skips[s]:])
        pool.detach(s1)
        assert pool.attach() == s1

    def test_segments_corpus_on_chip(self, tmp_path):
        """--segments corpus flow on hardware: per-segment features match
        direct extract of the sample slices."""
        from tpufeat import io as tio, pipeline
        d = tmp_path / "wavs"
        d.mkdir()
        sig = make_signal(48000, seed=362)
        tio.write_wav(str(d / "rec.wav"), sig, 16000)
        (tmp_path / "segments").write_text(
            "s1 rec.wav 0.0 1.25\ns2 rec 1.0 3.0\n")
        got = dict(pipeline.extract_corpus(
            str(d), MFCC13_HTK, batch_size=2,
            segments=str(tmp_path / "segments")))
        x, _ = tio.read_wav(str(d / "rec.wav"))
        for utt, (s, t) in {"s1": (0, 20000), "s2": (16000, 48000)}.items():
            want = np.asarray(
                features.extract(x[s:t], cfg=MFCC13_HTK).features)
            np.testing.assert_allclose(got[utt], want, atol=2e-5)


class TestIvectorOnChip:
    """I-vector subsystem on hardware (tpufeat/ivector.py): GEMM
    log-likelihoods, EM training, estimation, and the streaming twin —
    all against the float64 goldens."""

    @staticmethod
    def _trained():
        from tpufeat import ivector as iv
        r = np.random.default_rng(320)
        centers = r.standard_normal((3, 13)) * 3.0
        x = np.concatenate(
            [c + r.standard_normal((150, 13)) for c in centers]
        ).astype(np.float32)
        ubm = iv.train_diag_ubm(x, 8, iters=2, final_iters=4, seed=0)
        utts = [x[r.integers(0, len(x), 120)] for _ in range(4)]
        ext = iv.train_ivector_extractor(ubm, utts, ivector_dim=4,
                                         iters=2, seed=1)
        return x, ubm, ext

    def test_golden_parity_on_chip(self):
        from tpufeat import ivector as iv
        x, ubm, ext = self._trained()
        ll = np.asarray(ubm.log_likes(x[:64]))
        gll = cpu.diag_gmm_log_likes(x[:64], ubm.weights, ubm.means,
                                     ubm.vars)
        assert np.abs(ll - gll).max() < 1e-3
        n, f = ext.stats(x[:64])
        got = np.asarray(ext.estimate(n, f))
        ng, fg = cpu.ivector_stats(x[:64], ubm.weights, ubm.means,
                                   ubm.vars)
        want = cpu.ivector_estimate(ng, fg, ext.M, ubm.vars)
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_streaming_matches_offline_on_chip(self):
        from tpufeat import ivector as iv
        x, ubm, ext = self._trained()
        feats = x[:70]
        want = np.asarray(iv.ivector_features(ext, feats, period=10))
        st = iv.StreamingIvector(ext, period=10)
        outs, i = [], 0
        for c in (23, 7, 30, 10):
            outs.append(np.asarray(st.process(feats[None, i:i + c])))
            i += c
        got = np.concatenate(outs, axis=1)[0]
        np.testing.assert_allclose(got, want, atol=2e-3)
        gold = cpu.ivector_features(feats, ubm.weights, ubm.means,
                                    ubm.vars, ext.M, period=10,
                                    posterior_scale=0.1)
        np.testing.assert_allclose(want, gold, atol=2e-3)

    def test_pipeline_composition_on_chip(self):
        from tpufeat import ivector as iv
        _, ubm, ext = self._trained()
        cfg = dataclasses.replace(KALDI39, cmvn="none",
                                  matmul_precision="bf16x3", **FUSED)
        pipe = streaming.StreamingPipeline(cfg, batch_size=2, ivector=ext)
        sig = np.stack([make_signal(16000, seed=321),
                        make_signal(16000, seed=322)])
        rows = [np.asarray(pipe.process(sig[:, i:i + 3200]))
                for i in range(0, 16000, 3200)]
        rows.append(np.asarray(pipe.flush()))
        out = np.concatenate(rows, axis=1)
        assert out.shape[-1] == 39 + 4
        base_cfg = dataclasses.replace(cfg, deltas=False)
        base = np.asarray(features.extract(sig, cfg=base_cfg).features)
        want_iv = np.asarray(iv.ivector_features(ext, base, period=10))
        assert out.shape[1] == base.shape[1]
        np.testing.assert_allclose(out[..., 39:], want_iv, atol=2e-3)


class TestBeamformOnChip:
    """GCC-PHAT + delay-and-sum on hardware vs the float64 golden."""

    def test_recovers_delays_and_matches_golden(self):
        r = np.random.default_rng(330)
        n = 8000
        clean = r.standard_normal(n + 256)

        def shift(d):
            p = 16384
            X = np.fft.rfft(clean, n=p)
            k = np.arange(p // 2 + 1)
            return np.fft.irfft(X * np.exp(-2j * np.pi * k * d / p),
                                n=p)[:n]

        from tpufeat import beamform as bf
        delays = [0.0, 3.0, -5.0, 7.5]
        x = np.stack([shift(d) + 0.05 * r.standard_normal(n)
                      for d in delays]).astype(np.float32)
        d = np.asarray(bf.gcc_phat(x, max_delay=32))
        np.testing.assert_allclose(d, delays, atol=0.3)
        y, _ = bf.delay_and_sum(x, max_delay=32)
        want = cpu.delay_and_sum(x, 32)
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-3)


class TestPldaOnChip:
    """PLDA trial scoring on hardware (tpufeat/plda.py): the GEMM-
    factored [E, T] LLR matrix vs the float64 per-pair golden loop, at a
    serving-scale trial count."""

    def test_scoring_golden_parity_on_chip(self):
        from tpufeat import plda as pl
        r = np.random.default_rng(340)
        dim, n_spk, n_per = 16, 24, 6
        spk = r.standard_normal((n_spk, dim)) * 1.5
        x = (np.repeat(spk, n_per, axis=0)
             + r.standard_normal((n_spk * n_per, dim)))
        ids = np.repeat(np.arange(n_spk), n_per)
        model = pl.train_plda(x, ids, iters=5)
        enroll = r.standard_normal((32, dim))
        test = r.standard_normal((48, dim))
        n = r.integers(1, 6, 32)
        got = np.asarray(model.score(enroll, test, n_enroll=n))
        want = cpu.plda_log_likelihood_ratio(
            model.mean, model.transform, model.psi, enroll, n, test)
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-3)

    def test_large_trial_matrix_on_chip(self):
        """One dispatch scores a 2048 x 2048 trial grid; spot-check 16
        random pairs against the golden."""
        from tpufeat import plda as pl
        r = np.random.default_rng(341)
        dim = 32
        model = pl.Plda(r.standard_normal(dim),
                        np.linalg.qr(r.standard_normal((dim, dim)))[0],
                        np.sort(r.random(dim) * 5.0)[::-1])
        enroll = r.standard_normal((2048, dim))
        test = r.standard_normal((2048, dim))
        scores = np.asarray(model.score(enroll, test))
        assert scores.shape == (2048, 2048)
        es = r.integers(0, 2048, 16)
        ts = r.integers(0, 2048, 16)
        want = cpu.plda_log_likelihood_ratio(
            model.mean, model.transform, model.psi, enroll[es], 1,
            test[ts])
        np.testing.assert_allclose(scores[np.ix_(es, ts)], want,
                                   atol=2e-2, rtol=1e-3)


class TestFmllrOnChip:
    """fMLLR statistics accumulation on hardware vs the float64 golden
    loop, plus an end-to-end estimate+apply likelihood check."""

    def test_stats_and_adaptation_on_chip(self):
        from tpufeat import fmllr as fm, ivector as iv
        from tpufeat.data import apply_transform
        r = np.random.default_rng(350)
        centers = r.standard_normal((4, 6)) * 2.0
        frames = np.concatenate(
            [c + r.standard_normal((300, 6)) for c in centers]
        ).astype(np.float32)
        ubm = iv.train_diag_ubm(frames, 4, iters=2, final_iters=4, seed=0)
        x = frames[:200]
        beta, K, G = fm.fmllr_stats(ubm, x)
        bg, Kg, Gg = cpu.fmllr_stats(x, ubm.weights, ubm.means, ubm.vars)
        assert abs(beta - bg) < 1e-2
        np.testing.assert_allclose(K, Kg, rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(G, Gg, rtol=1e-3, atol=5e-2)
        xd = (frames * 1.4 + 0.7).astype(np.float32)
        W = fm.est_fmllr(ubm, xd, iters=15, min_count=1.0)
        adapted = np.asarray(apply_transform(xd, W))
        ll_gain = (iv.avg_log_like(ubm, adapted)
                   + np.linalg.slogdet(W[:, :-1])[1]
                   - iv.avg_log_like(ubm, xd))
        assert ll_gain > 0.05, ll_gain


class TestDiarizeOnChip:
    """Diarization on hardware: slice-arithmetic segment i-vectors vs
    the per-window oracle, and who-spoke-when end to end."""

    def test_segment_ivectors_and_diarize_on_chip(self):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_diarize import _speakers_fixture, TestDiarize
        from tpufeat import diarization as dz, ivector as iv
        ext, model, draw = _speakers_fixture()
        feats = np.concatenate([draw(0, 220, 901), draw(1, 180, 902)])
        got, spans = dz.segment_ivectors(ext, feats, window=100,
                                         period=50, min_post=0.0)
        got = np.asarray(got)
        for i, (s, e) in enumerate(spans):
            want = np.asarray(iv.utterance_ivector(ext, feats[s:e]))
            np.testing.assert_allclose(got[i], want, atol=2e-3)
        td = TestDiarize()
        audio, truth = td._alternating(
            draw, [(0, 300), (1, 300), (0, 300), (1, 300)])
        labels, _ = dz.diarize(ext, model, audio, window=150, period=75,
                               num_speakers=2)
        assert td._purity(labels, truth) > 0.85


class TestXvectorOnChip:
    """X-vector TDNN forward + one train step on hardware; embedding
    padding invariance survives the chip's conv lowering."""

    def test_forward_train_and_mask_on_chip(self):
        import optax
        from tpufeat.models import xvector as xv
        r = np.random.default_rng(360)
        feats = r.standard_normal((8, 40, 13)).astype(np.float32)
        labels = jnp.asarray(np.arange(8) % 4, jnp.int32)
        model = xv.xvector_model(4, embed_dim=16, channels=32)
        mask = jnp.ones((8, 40), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), feats, mask)
        tx = optax.adam(1e-3)
        state = xv.XvectorState(params, tx.init(params),
                                jnp.zeros((), jnp.int32))
        step = jax.jit(lambda s, f, m, l: xv.xvector_train_step(
            s, f, m, l, model=model, tx=tx))
        s1, l1 = step(state, feats, mask, labels)
        s2, l2 = step(s1, feats, mask, labels)
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
        emb = np.asarray(xv.extract_xvectors(s2.params, model,
                                             feats[:2],
                                             num_frames=[40, 25]))
        padded = np.concatenate(
            [feats[:2], 77.0 * np.ones((2, 17, 13), np.float32)], axis=1)
        emb_pad = np.asarray(xv.extract_xvectors(s2.params, model,
                                                 padded,
                                                 num_frames=[40, 25]))
        np.testing.assert_allclose(emb_pad, emb, atol=5e-3)


class TestGfccOnChip:
    """Gammatone/ERB bank (preset gfcc13) on hardware: XLA and fused
    signal-kernel paths vs the float64 golden."""

    def test_gfcc_golden_parity_on_chip(self):
        from tpufeat.config import GFCC13
        sig = make_signal(3 * 16000, seed=370)
        gold = cpu.extract(sig.astype(np.float64), GFCC13)
        got = np.asarray(features.extract(sig, cfg=GFCC13).features)
        assert np.abs(got - gold).max() < 2e-3
        fused = dataclasses.replace(GFCC13, use_pallas=True,
                                    gemm_dft=True, fused_framing=True,
                                    matmul_precision="bf16x3")
        got2 = np.asarray(features.extract(sig, cfg=fused).features)
        assert np.abs(got2 - gold).max() < 5e-3


class TestPnccOnChip:
    """PNCC chain on hardware (XLA + fused gammatone front halves) vs
    the float64 golden; scan recursions and mask-aware windows survive
    the chip lowering."""

    def test_pncc_golden_parity_on_chip(self):
        from tpufeat.config import PNCC13
        sig = make_signal(2 * 16000, seed=380)
        gold = cpu.extract(sig.astype(np.float64), PNCC13)
        got = np.asarray(features.extract(sig, cfg=PNCC13).features)
        assert np.abs(got - gold).max() < 2e-3
        fused = dataclasses.replace(PNCC13, use_pallas=True,
                                    gemm_dft=True, fused_framing=True,
                                    matmul_precision="bf16x3")
        got2 = np.asarray(features.extract(sig, cfg=fused).features)
        assert np.abs(got2 - gold).max() < 5e-3


class TestWhisper128OnChip:
    def test_whisper128_fused_parity_on_chip(self):
        from tpufeat.config import WHISPER128
        cfg = dataclasses.replace(WHISPER128, use_pallas=True,
                                  gemm_dft=True, fused_framing=True,
                                  matmul_precision="bf16x3")
        sig = make_signal(2 * 16000, seed=390)
        gold = cpu.extract(sig.astype(np.float64), WHISPER128)
        got = np.asarray(features.extract(sig, cfg=cfg).features)
        assert got.shape[1] == 128
        assert np.abs(got - gold).max() < 2e-3


class TestStreamingDiarizerOnChip:
    def test_online_matches_structure_on_chip(self):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_diarize import _speakers_fixture
        from tpufeat import diarization as dz
        ext, model, draw = _speakers_fixture()
        feats = np.concatenate([draw(0, 300, 970), draw(1, 300, 971)])
        sd = dz.StreamingDiarizer(ext, model)
        outs = []
        for i in range(0, 600, 150):
            labs, _ = sd.process(feats[i: i + 150])
            outs.append(labs)
        labs, _ = sd.flush()
        outs.append(labs)
        labels = np.concatenate(outs)
        assert labels.shape == (600,)
        assert sd.num_speakers >= 2
        assert (np.bincount(labels[:250]).argmax()
                != np.bincount(labels[350:]).argmax())


class TestTrainingObjectivesOnChip:
    """Transducer loss + VTLN warp estimation on hardware."""

    def test_transducer_loss_on_chip(self):
        from tpufeat.models import train
        r = np.random.default_rng(400)
        B, T, U, V = 4, 12, 3, 8
        logits = r.standard_normal((B, T, U + 1, V)).astype(np.float32)
        labels = r.integers(1, V, (B, U)).astype(np.int32)
        tlen = np.array([T, T - 2, T, T - 5])
        llen = np.array([U, U, U - 1, U])
        got = np.asarray(train.transducer_loss(logits, tlen, labels,
                                               llen))
        lp = np.asarray(jax.nn.log_softmax(
            jnp.asarray(logits, jnp.float64), axis=-1))
        for b in range(B):
            want = cpu.transducer_loss(lp[b], labels[b], int(tlen[b]),
                                       int(llen[b]))
            np.testing.assert_allclose(got[b], want, rtol=1e-4)

    def test_vtln_warp_on_chip(self):
        from tpufeat import fmllr as fm, ivector as iv
        sig = make_signal(24000, seed=401)
        feats = np.asarray(features.extract(sig, cfg=MFCC13_HTK).features)
        ubm = iv.train_diag_ubm(feats, 2, iters=1, final_iters=2, seed=0)
        best, scores = fm.estimate_vtln_warp(
            ubm, make_signal(16000, seed=402),
            warps=np.array([0.9, 1.0, 1.1]))
        assert best in (0.9, 1.0, 1.1)
        assert all(np.isfinite(v) for v in scores.values())
