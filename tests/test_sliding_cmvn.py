"""Sliding-window CMVN (reference C16's online sibling; Kaldi
apply-cmvn-sliding semantics): golden parity, mask invariance, config
integration, and streaming exactness."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import tpufeat
from tpufeat import features, streaming
from tpufeat.config import KALDI39
from tpufeat.reference import cpu


def _rand_feats(T, D=13, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((T, D)) * 3 + rng.standard_normal(D)
            ).astype(np.float32)


@pytest.mark.parametrize("center", [False, True])
@pytest.mark.parametrize("norm_vars", [False, True])
@pytest.mark.parametrize("T", [7, 50, 100, 601, 1500])
def test_golden_parity(center, norm_vars, T):
    """f32 JAX op vs the float64 per-frame-loop golden, across short
    (T < min_window), medium (< window), and long (> window) streams."""
    f = _rand_feats(T, seed=T)
    want = cpu.sliding_cmvn(f, window=600, min_window=100, center=center,
                            norm_vars=norm_vars)
    got = features.sliding_cmvn(
        jnp.asarray(f)[None], jnp.asarray([T]), window=600,
        min_window=100, center=center, norm_vars=norm_vars)[0]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=0)


def test_small_window_golden():
    f = _rand_feats(40, seed=3)
    want = cpu.sliding_cmvn(f, window=9, min_window=4, center=True,
                            norm_vars=True)
    got = features.sliding_cmvn(jnp.asarray(f)[None], None, window=9,
                                min_window=4, center=True, norm_vars=True)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=2e-5, rtol=0)


def test_mask_invariance():
    """Growing the padding never changes valid-frame outputs, and padded
    rows never contribute to any window."""
    T, D = 300, 13
    f = _rand_feats(T, D, seed=1)
    base = features.sliding_cmvn(jnp.asarray(f)[None], jnp.asarray([T]))
    padded = np.concatenate(
        [f, np.full((128, D), 1e6, np.float32)], axis=0)
    got = features.sliding_cmvn(jnp.asarray(padded)[None],
                                jnp.asarray([T]))
    np.testing.assert_array_equal(np.asarray(got[0, :T]),
                                  np.asarray(base[0]))


def test_batched_matches_per_utterance():
    lens = [90, 350, 700]
    T = max(lens)
    batch = np.zeros((len(lens), T, 13), np.float32)
    for i, n in enumerate(lens):
        batch[i, :n] = _rand_feats(n, seed=10 + i)
    got = features.sliding_cmvn(jnp.asarray(batch), jnp.asarray(lens),
                                norm_vars=True)
    for i, n in enumerate(lens):
        want = cpu.sliding_cmvn(batch[i, :n], norm_vars=True)
        np.testing.assert_allclose(np.asarray(got[i, :n]), want,
                                   atol=2e-5, rtol=0)


def _sliding_cfg(**kw):
    return dataclasses.replace(KALDI39, cmvn="sliding", **kw)


def test_extract_integration():
    """cfg.cmvn='sliding' end-to-end through extract() vs the golden."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(16000 * 3).astype(np.float32) * 0.1
    cfg = _sliding_cfg(cmvn_window=200, cmvn_min_window=50)
    got = tpufeat.extract(x, cfg=cfg)
    want = cpu.extract(x.astype(np.float64), cfg)
    nf = int(got.num_frames[0]) if got.num_frames.ndim else int(
        got.num_frames)
    assert nf == want.shape[0]
    np.testing.assert_allclose(np.asarray(got.features)[:nf], want,
                               atol=2e-3, rtol=0)


def test_config_validation():
    with pytest.raises(ValueError, match="unknown cmvn"):
        dataclasses.replace(KALDI39, cmvn="sliiding")
    with pytest.raises(ValueError, match="cmvn_window"):
        dataclasses.replace(KALDI39, cmvn="sliding", cmvn_window=0)


def test_time_sharding_rejects_sliding():
    from tpufeat import sharding
    with pytest.raises(ValueError, match="sliding"):
        sharding._check_time_shardable(_sliding_cfg())


@pytest.mark.parametrize("norm_vars", [False, True])
def test_streaming_matches_offline(norm_vars):
    """StreamingSlidingCMVN over a ragged chunk plan == offline causal
    operator (finite trailing windows -> exact up to f32 sum order)."""
    T, D = 800, 13
    f = _rand_feats(T, D, seed=2)
    want = features.sliding_cmvn(
        jnp.asarray(f)[None], None, window=150, min_window=40,
        center=False, norm_vars=norm_vars)[0]
    sc = streaming.StreamingSlidingCMVN(D, 1, window=150, min_window=40,
                                        norm_vars=norm_vars)
    outs, pos = [], 0
    for size in [10, 45, 1, 200, 7, 300, 237]:
        outs.append(sc.process(jnp.asarray(f[None, pos:pos + size])))
        pos += size
    assert pos == T
    outs.append(sc.flush())
    got = np.concatenate([np.asarray(o[0]) for o in outs], axis=0)
    assert got.shape == (T, D)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=0)


def test_streaming_short_stream_flush():
    """Streams shorter than min_window drain at flush with whole-stream
    statistics, exactly like the offline clamp."""
    T, D = 25, 13
    f = _rand_feats(T, D, seed=4)
    want = features.sliding_cmvn(jnp.asarray(f)[None], None, window=150,
                                 min_window=40)[0]
    sc = streaming.StreamingSlidingCMVN(D, 1, window=150, min_window=40)
    assert sc.process(jnp.asarray(f[None, :10])).shape[1] == 0
    assert sc.process(jnp.asarray(f[None, 10:])).shape[1] == 0
    got = np.asarray(sc.flush()[0])
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=0)


def test_streaming_state_roundtrip(tmp_path):
    D = 13
    f = _rand_feats(500, D, seed=5)
    sc = streaming.StreamingSlidingCMVN(D, 1, window=100, min_window=30)
    out1 = sc.process(jnp.asarray(f[None, :300]))
    p = str(tmp_path / "scmvn.npz")
    streaming.save_state(p, sc.state())
    sc2 = streaming.StreamingSlidingCMVN(D, 1, window=100, min_window=30)
    sc2.set_state(streaming.load_state(p, sc2.state()))
    a = sc.process(jnp.asarray(f[None, 300:]))
    b = sc2.process(jnp.asarray(f[None, 300:]))
    assert out1.shape[1] == 300
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_sliding_matches_offline_extract():
    """The composed StreamingPipeline with cmvn='sliding' reproduces the
    offline extract() of the same 39-dim config (delta chain contributes
    ~1-ulp FMA noise; the CMVN windows are identical)."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    cfg = _sliding_cfg(cmvn_window=120, cmvn_min_window=30)
    want = tpufeat.extract(x, cfg=cfg)
    nf = int(np.asarray(want.num_frames))
    sp = streaming.StreamingPipeline(cfg, batch_size=1)
    outs, pos, hop = [], 0, cfg.hop_length
    for chunks in [3, 1, 40, 25, 80, 51]:
        outs.append(sp.process(jnp.asarray(x[None, pos:pos + chunks * hop])))
        pos += chunks * hop
    assert pos == len(x)
    outs.append(sp.flush())
    got = np.concatenate([np.asarray(o[0]) for o in outs], axis=0)
    assert got.shape[0] == nf
    np.testing.assert_allclose(got, np.asarray(want.features)[:nf],
                               atol=1e-4, rtol=0)
