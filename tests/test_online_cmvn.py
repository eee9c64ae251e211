"""Kaldi online2 OnlineCmvn — trailing-window CMVN smoothed with
speaker/global priors (features.online_cmvn offline twin,
streaming.OnlineCmvn online twin with Freeze(), float64 golden
reference/cpu.online_cmvn)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpufeat import data, features, streaming
from tpufeat.reference import cpu


def _rows(T, D=13, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((T, D)) * 3.0
            + rng.standard_normal(D) * 5.0).astype(np.float32)


def _stats(D=13, seed=1, count=400.0):
    rng = np.random.default_rng(seed)
    st = data.CmvnStats(D)
    st.count = count
    mean = rng.standard_normal(D) * 2.0
    var = rng.uniform(0.5, 4.0, D)
    st.sum = mean * count
    st.sumsq = (var + mean * mean) * count
    return st


class TestOfflineVsGolden:
    @pytest.mark.parametrize("norm_vars", [False, True])
    def test_no_priors(self, norm_vars):
        x = _rows(300)
        got = np.asarray(features.online_cmvn(
            x, window=100, norm_vars=norm_vars))
        want = cpu.online_cmvn(x, window=100, norm_vars=norm_vars)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)

    @pytest.mark.parametrize("norm_vars", [False, True])
    def test_speaker_and_global_priors(self, norm_vars):
        x = _rows(250, seed=3)
        spk, glob = _stats(seed=4, count=350.0), _stats(seed=5,
                                                        count=5000.0)
        kw = dict(window=600, speaker_stats=spk, global_stats=glob,
                  speaker_frames=400, global_frames=200,
                  norm_vars=norm_vars)
        got = np.asarray(features.online_cmvn(x, **kw))
        want = cpu.online_cmvn(x, **kw)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)

    def test_small_speaker_prior_falls_through_to_global(self):
        """A speaker prior with fewer frames than speaker_frames is used
        in full, the remainder coming from the global prior."""
        x = _rows(50, seed=6)
        spk, glob = _stats(seed=7, count=30.0), _stats(seed=8, count=900.0)
        kw = dict(window=600, speaker_stats=spk, global_stats=glob,
                  speaker_frames=600, global_frames=200)
        got = np.asarray(features.online_cmvn(x, **kw))
        np.testing.assert_allclose(got, cpu.online_cmvn(x, **kw),
                                   atol=2e-4, rtol=0)

    def test_full_window_ignores_priors(self):
        """Once window frames exist the priors contribute nothing."""
        x = _rows(150, seed=9)
        a = np.asarray(features.online_cmvn(x, window=100))
        b = np.asarray(features.online_cmvn(
            x, window=100, speaker_stats=_stats(seed=10)))
        np.testing.assert_allclose(a[120:], b[120:], atol=1e-6, rtol=0)
        assert np.abs(a[:50] - b[:50]).max() > 1e-3   # early frames differ

    def test_batched_ragged_matches_per_utterance(self):
        xs = [_rows(180, seed=11), _rows(120, seed=12)]
        T = max(x.shape[0] for x in xs)
        batch = np.zeros((2, T, 13), np.float32)
        for b, x in enumerate(xs):
            batch[b, : x.shape[0]] = x
        nf = np.array([180, 120], np.int32)
        spk = _stats(seed=13)
        got = np.asarray(features.online_cmvn(
            batch, nf, window=100, speaker_stats=spk))
        for b, x in enumerate(xs):
            lone = np.asarray(features.online_cmvn(
                x, window=100, speaker_stats=spk))
            np.testing.assert_allclose(got[b, : x.shape[0]], lone,
                                       atol=2e-4, rtol=0)


class TestStreamingTwin:
    @pytest.mark.parametrize("plan", [[40, 40, 40, 40, 40],
                                      [1, 7, 160, 25, 7],
                                      [200]],
                             ids=["uniform", "ragged", "oneshot"])
    @pytest.mark.parametrize("norm_vars", [False, True])
    def test_matches_offline_any_plan(self, plan, norm_vars):
        x = _rows(sum(plan), seed=20)
        spk = _stats(seed=21, count=80.0)
        want = np.asarray(features.online_cmvn(
            x, window=120, speaker_stats=spk, norm_vars=norm_vars))
        oc = streaming.OnlineCmvn(13, window=120, speaker_stats=spk,
                                  norm_vars=norm_vars)
        outs, at = [], 0
        for c in plan:
            outs.append(np.asarray(oc.process(x[None, at: at + c])))
            at += c
        got = np.concatenate(outs, axis=1)[0]
        assert got.shape == want.shape       # no emission delay
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)

    def test_freeze_pins_stats(self):
        x = _rows(200, seed=22)
        oc = streaming.OnlineCmvn(13, window=100, norm_vars=True)
        oc.process(x[None, :150])
        oc.freeze()
        got = np.asarray(oc.process(x[None, 150:]))[0]
        # expected: the smoothed stats of frame 149, applied verbatim
        seg = x[50:150].astype(np.float64)
        mean = seg.mean(0)
        var = np.maximum((seg * seg).mean(0) - mean * mean, 1e-10)
        want = (x[150:] - mean) / np.sqrt(var)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)

    def test_freeze_before_frames_needs_prior(self):
        with pytest.raises(ValueError, match="prior"):
            streaming.OnlineCmvn(13, window=100).freeze()
        oc = streaming.OnlineCmvn(13, window=100,
                                  global_stats=_stats(seed=23))
        oc.freeze()                          # prior-only freeze is legal
        out = np.asarray(oc.process(_rows(10, seed=24)[None]))
        m = _stats(seed=23).mean
        np.testing.assert_allclose(out[0], _rows(10, seed=24) - m,
                                   atol=1e-4, rtol=0)

    def test_state_roundtrip(self, tmp_path):
        x = _rows(130, seed=25)
        spk = _stats(seed=26)
        mk = lambda: streaming.OnlineCmvn(  # noqa: E731
            13, window=90, speaker_stats=spk)
        a = mk()
        a.process(x[None, :70])
        p = str(tmp_path / "cmvn_state.npz")
        streaming.save_state(p, a.state())
        b = mk()
        b.set_state(streaming.load_state(p, b.state()))
        np.testing.assert_array_equal(np.asarray(a.process(x[None, 70:])),
                                      np.asarray(b.process(x[None, 70:])))

    def test_dim_mismatch_rejected(self):
        with pytest.raises(ValueError, match="dim"):
            streaming.OnlineCmvn(13, speaker_stats=_stats(D=20))

    def test_batch_rows_independent(self):
        xa, xb = _rows(90, seed=27), _rows(90, seed=28)
        oc = streaming.OnlineCmvn(13, batch_size=2, window=64)
        got = np.asarray(oc.process(np.stack([xa, xb])))
        for b, x in enumerate([xa, xb]):
            lone = np.asarray(features.online_cmvn(x, window=64))
            np.testing.assert_allclose(got[b], lone, atol=2e-4, rtol=0)
