"""Composed online config-3 pipeline (round-3 VERDICT item 5):
StreamingPipeline = front-end -> online Δ -> online ΔΔ -> running CMVN
behind one process()/flush() pair (tpufeat/streaming.py)."""

import dataclasses
import functools
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from tpufeat import features, streaming
from tpufeat.config import KALDI39, MFCC13_HTK

KALDI39_NOCMVN = dataclasses.replace(KALDI39, cmvn="none")


def isolated(test):
    """Run the test in a fresh pytest SUBPROCESS on the CPU backend.

    Applied to every test that compiles a streaming-pitch Viterbi
    program: XLA:CPU's LLVM has segfaulted compiling these in a
    long-lived suite process (observed 2026-08-18 at two different
    tests — whichever large pitch compile came first in-process — while
    each passes in a fresh process, even with torch pre-imported).
    Process isolation makes `pytest tests/` deterministic.
    TPUFEAT_ISOLATED=1 (the subprocess) runs the body inline, as does an
    on-chip run (a second TPU client is forbidden there, and the crash
    is CPU-backend-specific)."""
    @functools.wraps(test)
    def wrapper(self, *args, **kwargs):
        if (os.environ.get("TPUFEAT_ISOLATED") == "1"
                or os.environ.get("TPUFEAT_TEST_TPU") == "1"):
            return test(self, *args, **kwargs)
        node = f"{__file__}::{type(self).__name__}::{test.__name__}"
        env = dict(os.environ, TPUFEAT_ISOLATED="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x", node],
            env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, (
            f"isolated run failed (rc={r.returncode}):\n"
            f"{r.stdout[-3000:]}\n{r.stderr[-2000:]}")
    return wrapper


def _sig(b, n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((b, n)) * 0.1).astype(np.float32)


def _run(pipe, x, plan):
    outs, pos = [], 0
    for c in plan:
        outs.append(np.asarray(pipe.process(x[:, pos: pos + c])))
        pos += c
    assert pos == x.shape[1]
    outs.append(np.asarray(pipe.flush()))
    return np.concatenate(outs, axis=1)


class TestStreamingPipeline:
    @pytest.mark.parametrize("plan", [
        [1600] * 10,                       # hop-aligned steady chunks
        [4800, 1600, 160, 8000, 1440],     # ragged but hop-aligned
        [353] * 45 + [115],                # non-hop-aligned
    ])
    def test_matches_offline_kaldi39_deltas(self, plan):
        """concat(process outputs + flush) == the offline 39-dim pipeline
        (deltas exact; base features to streaming-vs-one-shot tolerance)."""
        b, n = 2, sum(plan)
        x = _sig(b, n, 90)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        got = _run(pipe, x, plan)
        want = np.asarray(features.extract(x, cfg=KALDI39_NOCMVN).features)
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 1e-5

    def test_vs_extract_scan_composition(self):
        """Base columns are BIT-exact vs extract_scan (the streaming
        oracle); the chained Δ/ΔΔ columns match the offline operator to
        1-ulp FMA-contraction noise (XLA contracts i*(plus-minus)
        differently across chunk shapes; measured 6e-8)."""
        b, n = 2, 24000
        x = _sig(b, n, 91)
        plan = [4800] * 5
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        got = _run(pipe, x, plan)
        base = streaming.extract_scan(x, MFCC13_HTK, chunk_len=4800)
        F = base.shape[1]
        nf = jnp.full((b,), F)
        d1 = features.deltas(base, nf)
        d2 = features.deltas(d1, nf)
        want = np.asarray(jnp.concatenate([base, d1, d2], axis=-1))
        np.testing.assert_array_equal(got[..., :13], want[..., :13])
        assert np.abs(got - want).max() < 1e-6

    def test_row_count_and_lookahead(self):
        """Each process() lags by exactly 2*delta_window rows once
        flowing; flush() drains exactly that many."""
        b = 1
        x = _sig(b, 16000, 92)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        emitted = 0
        for pos in range(0, 16000, 3200):
            out = pipe.process(x[:, pos: pos + 3200])
            emitted += out.shape[1]
        total = MFCC13_HTK.num_frames(16000)
        assert emitted == total - 4            # 2*window lookahead
        tail = pipe.flush()
        assert tail.shape[1] == 4
        assert tail.shape[2] == KALDI39.feature_dim

    def test_running_cmvn_converges_to_offline(self):
        """cfg.cmvn='mean': causal running normalization converges to the
        utterance-global statistics — late-stream rows match the offline
        CMVN output."""
        b, n = 1, 160000                        # 10 s, ~998 frames
        x = _sig(b, n, 93)
        pipe = streaming.StreamingPipeline(KALDI39, batch_size=b)
        got = _run(pipe, x, [16000] * 10)
        want = np.asarray(features.extract(x, cfg=KALDI39).features)
        assert got.shape == want.shape
        # early frames normalized by early stats — differ; the last 10%
        # sees nearly the full-utterance mean
        last = slice(int(0.9 * got.shape[1]), None)
        assert np.abs(got[:, last] - want[:, last]).max() < 0.12
        # and the overall mean shift is bounded
        assert np.abs(got - want).mean() < 0.05

    def test_short_stream_shorter_than_lookahead(self):
        """Streams with fewer frames than 2*window still emit every row at
        flush with correct edge replication."""
        b = 1
        n = 400 + 2 * 160                       # exactly 3 frames
        x = _sig(b, n, 94)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        out1 = pipe.process(x)
        tail = np.asarray(pipe.flush())
        got = np.concatenate([np.asarray(out1), tail], axis=1)
        want = np.asarray(features.extract(x, cfg=KALDI39_NOCMVN).features)
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 1e-5

    def test_checkpoint_resume(self, tmp_path):
        """state()/set_state round-trips through save_state/load_state and
        the resumed pipeline continues bit-identically."""
        b = 2
        x = _sig(b, 32000, 95)
        plan = [6400, 9600, 6400, 9600]
        ref = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        want = _run(ref, x, plan)

        p1 = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        first = [np.asarray(p1.process(x[:, :6400])),
                 np.asarray(p1.process(x[:, 6400:16000]))]
        path = str(tmp_path / "pipe.npz")
        streaming.save_state(path, p1.state())
        p2 = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        p2.set_state(streaming.load_state(path, p2.state()))
        rest = [np.asarray(p2.process(x[:, 16000:22400])),
                np.asarray(p2.process(x[:, 22400:])),
                np.asarray(p2.flush())]
        got = np.concatenate(first + rest, axis=1)
        np.testing.assert_array_equal(got, want)

    def test_rejects_non_delta_config(self):
        with pytest.raises(ValueError, match="deltas"):
            streaming.StreamingPipeline(MFCC13_HTK)

    def test_meanvar_mode_runs(self):
        cfg = dataclasses.replace(KALDI39, cmvn="meanvar")
        pipe = streaming.StreamingPipeline(cfg, batch_size=1)
        x = _sig(1, 8000, 96)
        out = _run(pipe, x, [4000, 4000])
        assert out.shape[1] == MFCC13_HTK.num_frames(8000)
        assert np.isfinite(out).all()


def _voiced(b, n, seed):
    """Tones (one f0 per row) + light noise — the pitch tracker needs a
    voiced signal for offline/online decision parity to be meaningful."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    f0 = 120.0 + 60.0 * np.arange(b)[:, None]
    x = 0.4 * np.sin(2 * np.pi * f0 * t[None, :])
    return (x + 0.01 * rng.standard_normal((b, n))).astype(np.float32)


class TestInputRate:
    """StreamingPipeline(input_rate=...) — online resampler ahead of the
    front-end; matches offline resample() -> extract()."""

    def test_48k_ingest_matches_offline(self):
        b = 2
        x48 = _sig(b, 96000, 91)                  # 2 s at 48 kHz
        from tpufeat.resampling import resample
        x16 = np.asarray(resample(x48, 48000, 16000))
        want = np.asarray(features.extract(x16, cfg=KALDI39_NOCMVN).features)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                           input_rate=48000)
        got = _run(pipe, x48, [4800, 333, 14400, 48000, 28467])
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 1e-5

    def test_checkpoint_resume_with_resampler(self, tmp_path):
        x48 = _sig(1, 48000, 92)
        a = streaming.StreamingPipeline(KALDI39_NOCMVN, input_rate=48000)
        a.process(x48[:, :20000])
        streaming.save_state(str(tmp_path / "s.npz"), a.state())
        b = streaming.StreamingPipeline(KALDI39_NOCMVN, input_rate=48000)
        b.set_state(streaming.load_state(str(tmp_path / "s.npz"),
                                         a.state()))
        ya = np.concatenate([np.asarray(a.process(x48[:, 20000:])),
                             np.asarray(a.flush())], axis=1)
        yb = np.concatenate([np.asarray(b.process(x48[:, 20000:])),
                             np.asarray(b.flush())], axis=1)
        np.testing.assert_array_equal(ya, yb)

    def test_input_rate_checkpoint_mismatch_rejected(self):
        a = streaming.StreamingPipeline(KALDI39_NOCMVN, input_rate=48000)
        s = a.state()
        b = streaming.StreamingPipeline(KALDI39_NOCMVN)
        with pytest.raises(ValueError, match="input_rate mismatch"):
            b.set_state(s)
        with pytest.raises(ValueError, match="input_rate mismatch"):
            a.set_state(b.state())

    def test_same_rate_is_passthrough(self):
        x = _sig(1, 16000, 93)
        a = streaming.StreamingPipeline(KALDI39_NOCMVN, input_rate=16000)
        bpipe = streaming.StreamingPipeline(KALDI39_NOCMVN)
        ya = _run(a, x, [1600] * 10)
        yb = _run(bpipe, x, [1600] * 10)
        np.testing.assert_array_equal(ya, yb)


class TestDeltaOrder:
    """cfg.delta_order chains that many online delta stages."""

    @pytest.mark.parametrize("order", [1, 3])
    def test_matches_offline(self, order):
        cfg = dataclasses.replace(KALDI39_NOCMVN, delta_order=order)
        b = 2
        x = _sig(b, 19200, 93)
        pipe = streaming.StreamingPipeline(cfg, batch_size=b)
        got = _run(pipe, x, [3200] * 6)
        want = np.asarray(features.extract(x, cfg=cfg).features)
        assert got.shape == want.shape
        assert got.shape[-1] == 13 * (1 + order)
        assert np.abs(got - want).max() < 1e-5

    def test_checkpoint_resume_order3(self, tmp_path):
        cfg = dataclasses.replace(KALDI39_NOCMVN, delta_order=3)
        b = 1
        x = _sig(b, 16000, 94)
        ref = streaming.StreamingPipeline(cfg, batch_size=b)
        want = _run(ref, x, [8000, 8000])
        p1 = streaming.StreamingPipeline(cfg, batch_size=b)
        first = np.asarray(p1.process(x[:, :8000]))
        path = str(tmp_path / "p3.npz")
        streaming.save_state(path, p1.state())
        p2 = streaming.StreamingPipeline(cfg, batch_size=b)
        p2.set_state(streaming.load_state(path, p2.state()))
        got = np.concatenate(
            [first, np.asarray(p2.process(x[:, 8000:])),
             np.asarray(p2.flush())], axis=1)
        np.testing.assert_array_equal(got, want)

    def test_state_order_mismatch_rejected(self):
        cfg3 = dataclasses.replace(KALDI39_NOCMVN, delta_order=3)
        p1 = streaming.StreamingPipeline(cfg3, batch_size=1)
        p2 = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=1)
        with pytest.raises(ValueError, match="delta_order mismatch"):
            p2.set_state(p1.state())


class TestStreamingPipelinePitch:
    """pitch=True on StreamingPipeline — the online sibling of
    `cli --pitch` (42-dim rows on the shared hop grid)."""

    def _full_lookahead_body(self, n):
        """Lookahead >= total frames: every column — 39 spectral + POV +
        mean-subtracted log-pitch + delta-log-pitch — matches the offline
        extract()+pitch_features() concatenation (the CLI composition),
        truncated to the pitch frame count like cli.py:163."""
        from tpufeat import pitch as pm
        b = 2
        x = _voiced(b, n, 97)
        # ballast=0: the NCCF ballast is a per-utterance GLOBAL RMS
        # statistic; online uses a running RMS (documented divergence,
        # pitch.py PitchStreamState) — exactness tests pin it off
        pcfg = pm.config_for(KALDI39_NOCMVN, ballast=0.0)
        Fp = pcfg.num_frames(n)
        pipe = streaming.StreamingPipeline(
            KALDI39_NOCMVN, batch_size=b, pitch=pcfg,
            pitch_lookahead=Fp + 4)
        assert pipe.out_dim == 42
        got = _run(pipe, x, [n // 5] * 5)
        main = np.asarray(features.extract(x, cfg=KALDI39_NOCMVN).features)
        pf, _ = pm.pitch_features(x, cfg=pcfg)
        want = np.concatenate([main[:, :Fp], np.asarray(pf)[:, :Fp]],
                              axis=-1)
        assert got.shape == (b, Fp, 42)
        np.testing.assert_allclose(got[..., :39], want[..., :39],
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(got[..., 39:], want[..., 39:],
                                   rtol=0, atol=2e-5)

    @isolated
    def test_full_lookahead_matches_offline_composition_small(self):
        """Default-tier anchor of the full-lookahead contract (n=8000:
        the XLA:CPU compile scales with the lookahead depth; the n=24000
        original costs ~210 s of LLVM and runs in the slow tier)."""
        self._full_lookahead_body(8000)

    @pytest.mark.slow  # ~210 s XLA:CPU compile; _small keeps the contract in the default tier
    @isolated
    def test_full_lookahead_matches_offline_composition(self):
        self._full_lookahead_body(24000)

    @isolated
    def test_realistic_lookahead_shape_and_grid(self):
        """K=15 online: emitted row count == pitch frame count; POV and
        delta-log-pitch columns match offline (decisions final after the
        Viterbi warmup; deltas are shift-invariant)."""
        from tpufeat import pitch as pm
        b, n = 1, 20000
        x = _voiced(b, n, 98)
        pcfg = pm.config_for(KALDI39_NOCMVN, ballast=0.0)
        Fp = pcfg.num_frames(n)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                           pitch=pcfg, pitch_lookahead=15)
        got = _run(pipe, x, [1600] * 12 + [800])
        assert got.shape == (b, Fp, 42)
        pf, _ = pm.pitch_features(x, cfg=pcfg)
        w = np.asarray(pf)[:, :Fp]
        np.testing.assert_allclose(got[..., 39], w[..., 0], rtol=0,
                                   atol=2e-5)
        np.testing.assert_allclose(got[..., 41], w[..., 2], rtol=0,
                                   atol=2e-5)

    @isolated
    def test_pitch_checkpoint_resume(self, tmp_path):
        """state()/set_state with pitch enabled round-trips through
        save_state/load_state; the resumed pipeline (incl. tracker ring
        buffers, delta carries, alignment FIFOs) continues
        bit-identically."""
        b = 2
        x = _voiced(b, 32000, 99)
        plan = [6400, 9600, 6400, 9600]
        ref = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                          pitch=True)
        want = _run(ref, x, plan)

        p1 = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                         pitch=True)
        first = [np.asarray(p1.process(x[:, :6400])),
                 np.asarray(p1.process(x[:, 6400:16000]))]
        path = str(tmp_path / "pipe_pitch.npz")
        streaming.save_state(path, p1.state())
        p2 = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                         pitch=True)
        p2.set_state(streaming.load_state(path, p2.state()))
        rest = [np.asarray(p2.process(x[:, 16000:22400])),
                np.asarray(p2.process(x[:, 22400:])),
                np.asarray(p2.flush())]
        got = np.concatenate(first + rest, axis=1)
        np.testing.assert_array_equal(got, want)

    @isolated
    def test_reset_preserves_pitch(self):
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=1,
                                           pitch=True)
        x = _voiced(1, 8000, 100)
        _run(pipe, x, [4000, 4000])
        pipe.reset()
        assert pipe.out_dim == 42
        out = _run(pipe, x, [4000, 4000])
        assert out.shape[-1] == 42 and np.isfinite(out).all()


class TestSlidingCmvnPitchComposition:
    def _body(self, n, window, min_window, chunks):
        """cmvn='sliding' + pitch=True compose: spectral columns match the
        offline sliding-CMVN extract truncated to the pitch grid (CMVN
        covers spectral columns only, like the offline CLI), pitch
        columns match the pitch-only composition."""
        from tpufeat import pitch as pm
        cfg = dataclasses.replace(KALDI39, cmvn="sliding",
                                  cmvn_window=window,
                                  cmvn_min_window=min_window)
        b = 2
        x = _voiced(b, n, 99)
        pcfg = pm.config_for(cfg, ballast=0.0)
        Fp = pcfg.num_frames(n)
        pipe = streaming.StreamingPipeline(cfg, batch_size=b, pitch=pcfg,
                                           pitch_lookahead=Fp + 4)
        got = _run(pipe, x, [n // chunks] * chunks)
        main = np.asarray(features.extract(x, cfg=cfg).features)
        pf, _ = pm.pitch_features(x, cfg=pcfg)
        assert got.shape == (b, Fp, 42)
        np.testing.assert_allclose(got[..., :39], main[:, :Fp],
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(got[..., 39:], np.asarray(pf)[:, :Fp],
                                   rtol=0, atol=2e-5)

    @isolated
    def test_sliding_cmvn_with_pitch_small(self):
        """Default-tier anchor (n=8000, window < the 46-frame pitch
        grid so the sliding path is really exercised): the full-
        lookahead flush program's XLA:CPU compile scales with lookahead
        depth — the n=24000 original costs ~220 s of LLVM and runs in
        the slow tier (same treatment as
        test_full_lookahead_matches_offline_composition)."""
        self._body(8000, window=30, min_window=10, chunks=5)

    @pytest.mark.slow  # ~220 s XLA:CPU compile; _small keeps the contract
    @isolated
    def test_sliding_cmvn_with_pitch(self):
        self._body(24000, window=60, min_window=20, chunks=5)


class TestOnlineCmvnComposition:
    """Kaldi online2 OnlineCmvn plugged into the composed pipeline
    (online_cmvn= kwarg, mutually exclusive with cfg.cmvn)."""

    @staticmethod
    def _stats(D, seed, count=400.0):
        from tpufeat import data
        rng = np.random.default_rng(seed)
        st = data.CmvnStats(D)
        st.count = count
        mean = rng.standard_normal(D) * 2.0
        var = rng.uniform(0.5, 4.0, D)
        st.sum = mean * count
        st.sumsq = (var + mean * mean) * count
        return st

    @isolated
    def test_matches_offline_composition(self):
        """process/flush through OnlineCmvn == offline 39-dim extract
        followed by features.online_cmvn (same window + speaker prior).

        Isolated: with the round-3 suite growth (plda/fmllr/diarize
        compiles land earlier in the run) the in-process XLA:CPU LLVM
        segfault moved from the pitch tests to THIS compile (observed
        2026-08-19, rc=139 at tests/test_streaming_pipeline.py:426);
        same crash class the ``isolated`` docstring records."""
        b, n = 2, 24000
        x = _sig(b, n, 95)
        spk = self._stats(39, seed=96, count=150.0)
        oc = streaming.OnlineCmvn(39, batch_size=b, window=120,
                                  speaker_stats=spk, norm_vars=True)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                           online_cmvn=oc)
        got = _run(pipe, x, [4800, 353, 8000, 1600, 9247])
        base = np.asarray(features.extract(x, cfg=KALDI39_NOCMVN).features)
        want = np.asarray(features.online_cmvn(
            base, window=120, speaker_stats=spk, norm_vars=True))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)

    def test_rejects_cfg_cmvn(self):
        oc = streaming.OnlineCmvn(39)
        with pytest.raises(ValueError, match="cmvn"):
            streaming.StreamingPipeline(KALDI39, online_cmvn=oc)

    def test_rejects_dim_mismatch(self):
        oc = streaming.OnlineCmvn(13)
        with pytest.raises(ValueError, match="dim"):
            streaming.StreamingPipeline(KALDI39_NOCMVN, online_cmvn=oc)

    def test_checkpoint_resume(self, tmp_path):
        b = 1
        x = _sig(b, 16000, 97)
        mk = lambda: streaming.StreamingPipeline(  # noqa: E731
            KALDI39_NOCMVN, batch_size=b,
            online_cmvn=streaming.OnlineCmvn(39, batch_size=b, window=90))
        a = mk()
        out_a1 = np.asarray(a.process(x[:, :9600]))
        p = str(tmp_path / "pipe_state.npz")
        streaming.save_state(p, a.state())
        c = mk()
        c.set_state(streaming.load_state(p, c.state()))
        tail_a = np.concatenate([np.asarray(a.process(x[:, 9600:])),
                                 np.asarray(a.flush())], axis=1)
        tail_c = np.concatenate([np.asarray(c.process(x[:, 9600:])),
                                 np.asarray(c.flush())], axis=1)
        np.testing.assert_array_equal(tail_a, tail_c)
        assert out_a1.shape[-1] == 39


class TestPitchResetRows:
    """Slot recycle through the pitch path (reset_rows — see
    tests/test_stream_pool.py for the non-pitch contracts)."""

    @isolated
    def test_pitch_pipeline_reset_rows(self):
        """Row independence holds through the tracker/FIFO state; the
        reset slot keeps emitting finite 42-dim rows; warmup_rows covers
        the Viterbi restart."""
        def run(pipe, x, plan, reset_at=None):
            outs, pos = [], 0
            for i, c in enumerate(plan):
                outs.append(np.asarray(pipe.process(x[:, pos: pos + c])))
                pos += c
                if reset_at is not None and i == reset_at:
                    pipe.reset_rows([0])
            return np.concatenate(outs, axis=1)

        b = 2
        x = _voiced(b, 16000, 60)
        plan = [4000, 4000, 4000, 4000]
        ref = run(streaming.StreamingPipeline(
            KALDI39_NOCMVN, batch_size=b, pitch=True), x, plan)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN,
                                           batch_size=b, pitch=True)
        assert pipe.warmup_rows == 8 + 2 * (15 + 2 * 2)
        got = run(pipe, x, plan, reset_at=1)
        np.testing.assert_array_equal(got[1], ref[1])
        assert got.shape[-1] == 42 and np.isfinite(got).all()
        assert not np.array_equal(got[0], ref[0])


class TestIvectorComposition:
    """Online i-vectors appended by the composed pipeline (ivector=
    kwarg; Kaldi online2 OnlineIvectorFeature semantics — see
    tpufeat/ivector.py)."""

    @staticmethod
    @functools.lru_cache(maxsize=1)
    def _extractor():
        from tpufeat import ivector as iv
        base_cfg = dataclasses.replace(KALDI39, deltas=False, cmvn="none")
        train = np.asarray(features.extract(
            _sig(4, 16000, 90), cfg=base_cfg).features).reshape(-1, 13)
        ubm = iv.train_diag_ubm(train, 4, iters=2, final_iters=4, seed=0)
        utts = [train[i::4] for i in range(4)]
        return iv.train_ivector_extractor(ubm, utts, ivector_dim=4,
                                          iters=2, seed=1)

    def test_matches_offline_composition(self):
        from tpufeat import ivector as iv
        ext = self._extractor()
        b, n = 2, 16000
        x = _sig(b, n, 91)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                           ivector=ext, ivector_period=10)
        assert pipe.out_dim == 39 + 4
        got = _run(pipe, x, [4800, 1600, 3200, 6400])   # hop-aligned
        base_cfg = dataclasses.replace(KALDI39, deltas=False, cmvn="none")
        base = np.asarray(features.extract(x, cfg=base_cfg).features)
        want_iv = np.asarray(iv.ivector_features(ext, base, period=10))
        want_main = np.asarray(
            features.extract(x, cfg=KALDI39_NOCMVN).features)
        assert got.shape == (b, base.shape[1], 43)
        np.testing.assert_allclose(got[..., :39], want_main, atol=5e-4)
        np.testing.assert_allclose(got[..., 39:], want_iv, atol=1e-4)

    def test_with_pitch_truncates_ivector_identically(self):
        ext = self._extractor()
        b = 1
        x = _voiced(b, 16000, 92)
        pipe = streaming.StreamingPipeline(
            KALDI39_NOCMVN, batch_size=b, pitch=True, ivector=ext)
        assert pipe.out_dim == 39 + 3 + 4
        out = _run(pipe, x, [8000, 8000])
        ref = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                          ivector=ext)
        full = _run(ref, x, [8000, 8000])
        n = out.shape[1]
        assert n <= full.shape[1]       # pitch window decides fewer rows
        np.testing.assert_array_equal(out[..., -4:], full[:, :n, -4:])

    def test_checkpoint_resume(self, tmp_path):
        ext = self._extractor()
        x = _sig(1, 16000, 93)
        mk = lambda: streaming.StreamingPipeline(  # noqa: E731
            KALDI39_NOCMVN, batch_size=1, ivector=ext)
        a = mk()
        a.process(x[:, :9600])
        p = str(tmp_path / "ivpipe_state.npz")
        streaming.save_state(p, a.state())
        c = mk()
        c.set_state(streaming.load_state(p, c.state()))
        tail_a = np.concatenate([np.asarray(a.process(x[:, 9600:])),
                                 np.asarray(a.flush())], axis=1)
        tail_c = np.concatenate([np.asarray(c.process(x[:, 9600:])),
                                 np.asarray(c.flush())], axis=1)
        np.testing.assert_array_equal(tail_a, tail_c)

    def test_reset_rows_keeps_other_rows(self):
        ext = self._extractor()
        b = 2
        x = _sig(b, 12800, 94)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                           ivector=ext)
        ref = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                          ivector=ext)
        o1 = np.asarray(pipe.process(x[:, :6400]))
        r1 = np.asarray(ref.process(x[:, :6400]))
        pipe.reset_rows([1])
        o2 = np.asarray(pipe.process(x[:, 6400:]))
        r2 = np.asarray(ref.process(x[:, 6400:]))
        np.testing.assert_array_equal(o1[0], r1[0])
        np.testing.assert_array_equal(o2[0], r2[0])

    def test_reset_restores_fresh(self):
        ext = self._extractor()
        x = _sig(1, 9600, 95)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=1,
                                           ivector=ext)
        first = _run(pipe, x, [4800, 4800])
        pipe.reset()
        again = _run(pipe, x, [4800, 4800])
        np.testing.assert_array_equal(first, again)
        assert pipe.out_dim == 43

    def test_rejects_dim_mismatch(self):
        from tpufeat import ivector as iv
        ubm = iv.DiagUbm(np.full(2, 0.5), np.zeros((2, 5)),
                         np.ones((2, 5)))
        bad = iv.IvectorExtractor(ubm, np.zeros((2, 5, 3)))
        with pytest.raises(ValueError, match="dim"):
            streaming.StreamingPipeline(KALDI39_NOCMVN, ivector=bad)

    def test_rejects_wrong_type(self):
        with pytest.raises(TypeError, match="IvectorExtractor"):
            streaming.StreamingPipeline(KALDI39_NOCMVN, ivector=object())


class TestOnlineTransform:
    """transform= (Kaldi online2 OnlineTransform: LDA/fMLLR applied to
    the assembled post-CMVN spectral rows)."""

    def test_matches_offline_apply(self):
        from tpufeat.data import apply_transform
        r = np.random.default_rng(42)
        W = np.concatenate([r.standard_normal((20, 39)) * 0.3,
                            r.standard_normal((20, 1))], axis=1)
        b, n = 2, 16000
        x = _sig(b, n, 43)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                           transform=W)
        assert pipe.out_dim == 20
        got = _run(pipe, x, [4800, 3200, 8000])
        base = np.asarray(features.extract(x, cfg=KALDI39_NOCMVN).features)
        want = np.asarray(apply_transform(base[:, :got.shape[1]], W))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_composes_with_ivector_columns(self):
        from tpufeat import ivector as iv
        r = np.random.default_rng(44)
        frames = r.standard_normal((400, 13)).astype(np.float32)
        ubm = iv.train_diag_ubm(frames, 2, iters=1, final_iters=2, seed=0)
        ext = iv.train_ivector_extractor(ubm, [frames], ivector_dim=4,
                                         iters=1, seed=0)
        W = np.eye(39, dtype=np.float32) * 2.0
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=1,
                                           transform=W, ivector=ext)
        assert pipe.out_dim == 39 + 4
        x = _sig(1, 8000, 45)
        out = _run(pipe, x, [8000])
        # spectral columns transformed, i-vector columns appended raw
        base = np.asarray(features.extract(x, cfg=KALDI39_NOCMVN).features)
        np.testing.assert_allclose(out[..., :39],
                                   2.0 * base[:, :out.shape[1]],
                                   atol=2e-5)

    def test_validates_shape(self):
        with pytest.raises(ValueError, match="transform"):
            streaming.StreamingPipeline(KALDI39_NOCMVN,
                                        transform=np.zeros((20, 7)))


class TestOnlineTransformComposition:
    """Round-3 review fixes: transform= must survive reset(), cover the
    sliding-CMVN flush rows, and keep zero-row chunks at the transformed
    width."""

    W = None

    @classmethod
    def _w(cls):
        if cls.W is None:
            r = np.random.default_rng(77)
            cls.W = np.concatenate([r.standard_normal((20, 39)) * 0.3,
                                    r.standard_normal((20, 1))], axis=1)
        return cls.W

    def test_survives_reset(self):
        W = self._w()
        x = _sig(1, 8000, 78)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=1,
                                           transform=W)
        want = _run(pipe, x, [8000])
        pipe.reset()
        assert pipe.out_dim == 20
        got = _run(pipe, x, [8000])
        np.testing.assert_array_equal(got, want)

    def test_sliding_cmvn_flush_rows_transformed(self):
        """A stream shorter than cmvn_min_window emits every row at
        flush — those rows must be transformed too (non-square W would
        crash, and square W would silently skip the matrix)."""
        import dataclasses
        from tpufeat.data import apply_transform
        from tpufeat import features
        W = self._w()
        cfg = dataclasses.replace(KALDI39_NOCMVN, cmvn="sliding",
                                  cmvn_window=120, cmvn_min_window=100)
        x = _sig(1, 8000, 79)       # ~48 frames < min_window: all flush
        pipe = streaming.StreamingPipeline(cfg, batch_size=1,
                                           transform=W)
        got = _run(pipe, x, [4800, 3200])
        assert got.shape[-1] == 20
        base = np.asarray(features.extract(x, cfg=cfg).features)
        want = np.asarray(apply_transform(base[:, :got.shape[1]], W))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_zero_row_chunk_width(self):
        W = self._w()
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=1,
                                           transform=W)
        out = pipe.process(np.zeros((1, 100), np.float32))  # < 1 frame
        assert out.shape == (1, 0, 20)
