"""Per-slot reset (reset_rows) + StreamPool slot manager — utterance
turnover inside a fixed-shape serving batch (tpufeat/streaming.py).

The contracts under test:
  - resetting a slot leaves every OTHER row bit-unchanged (pure per-row
    where);
  - a reset front-end slot restarts as a zeros-carrying (silence) stream:
    bit-exact vs a fresh run fed (zeros-prefix ++ tail) under the same
    chunk plan;
  - pipeline slots are exact vs the zeros-prefix oracle after the
    documented warmup_rows transient;
  - OnlineCmvn slots restart per-row against the speaker/global priors
    (Kaldi fresh-utterance semantics);
  - StreamPool leases/recycles slots and trims each slot's warmup rows.
"""

import dataclasses

import numpy as np
import pytest

from tpufeat import features, streaming
from tpufeat.config import KALDI39, MFCC13_HTK

KALDI39_NOCMVN = dataclasses.replace(KALDI39, cmvn="none")


def _sig(b, n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((b, n)) * 0.1).astype(np.float32)


def _run_plan(obj, x, plan, reset_at=None, rows=(0,)):
    """Drive process() over `plan`-sized chunks, optionally calling
    reset_rows(rows) after chunk index `reset_at`; returns the
    concatenated outputs (frontend returns (feats, mask) -> feats)."""
    outs, pos = [], 0
    for i, c in enumerate(plan):
        out = obj.process(x[:, pos: pos + c])
        if isinstance(out, tuple):
            out = out[0]
        outs.append(np.asarray(out))
        pos += c
        if reset_at is not None and i == reset_at:
            obj.reset_rows(list(rows))
    return np.concatenate(outs, axis=1)


class TestFrontendResetRows:
    PLAN = [1600, 4800, 1600, 3200, 1600]

    def test_silence_prefix_exact_and_others_untouched(self):
        b = 2
        x = _sig(b, sum(self.PLAN), seed=10)
        # reference: no reset
        ref = _run_plan(streaming.StreamingFrontend(MFCC13_HTK, b), x,
                        self.PLAN)
        # reset row 0 after the first two chunks
        fe = streaming.StreamingFrontend(MFCC13_HTK, b)
        got = _run_plan(fe, x, self.PLAN, reset_at=1)
        # row 1 (not reset): bit-identical to the un-reset run
        np.testing.assert_array_equal(got[1], ref[1])
        # row 0: post-reset frames == a fresh stream fed zeros for the
        # consumed prefix then the same tail, same chunk plan (bitwise)
        pre = sum(self.PLAN[:2])
        xz = x.copy()
        xz[0, :pre] = 0.0
        oracle = _run_plan(streaming.StreamingFrontend(MFCC13_HTK, b), xz,
                           self.PLAN)
        f_pre = MFCC13_HTK.num_frames(pre)       # frames emitted pre-reset
        np.testing.assert_array_equal(got[0, f_pre:], oracle[0, f_pre:])

    def test_reset_rows_keeps_schedule(self):
        fe = streaming.StreamingFrontend(MFCC13_HTK, 2)
        fe.process(_sig(2, 1000, 11))            # fill = 1000 - 600... > 0
        fill = fe._fill
        fe.reset_rows([1])
        assert fe._fill == fill                  # shared clock untouched


class TestPipelineResetRows:
    PLAN = [4800, 4800, 4800, 4800]

    def test_row_independence_and_oracle_after_warmup(self):
        b, n = 2, sum(self.PLAN)
        x = _sig(b, n, 20)
        ref = _run_plan(streaming.StreamingPipeline(KALDI39_NOCMVN, b), x,
                        self.PLAN)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        assert pipe.warmup_rows == 8             # 2 * delta_order * window
        got = _run_plan(pipe, x, self.PLAN, reset_at=1)
        np.testing.assert_array_equal(got[1], ref[1])
        pre = sum(self.PLAN[:2])
        xz = x.copy()
        xz[0, :pre] = 0.0
        oracle = _run_plan(
            streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b), xz,
            self.PLAN)
        r0 = MFCC13_HTK.num_frames(pre) + pipe.warmup_rows
        np.testing.assert_array_equal(got[0, r0:], oracle[0, r0:])

    def test_running_cmvn_stats_restart(self):
        """cfg.cmvn='mean': the reset slot's Welford stats restart (count
        back to its own post-reset rows) while the other slot keeps
        accumulating — and its normalization visibly sheds the biased
        pre-reset segment."""
        b = 2
        x = _sig(b, 19200, 21)
        x[0, :9600] += 5.0                       # biased pre-reset segment
        ref = _run_plan(streaming.StreamingPipeline(KALDI39, b), x,
                        [4800] * 4)
        pipe = streaming.StreamingPipeline(KALDI39, batch_size=b)
        got = _run_plan(pipe, x, [4800] * 4, reset_at=1)
        counts = np.asarray(pipe.cmvn_stats.count)
        emitted = got.shape[1]
        lag = KALDI39.delta_order * KALDI39.delta_window
        pre = MFCC13_HTK.num_frames(9600) - lag  # rows emitted pre-reset
        assert counts[0] == emitted - pre        # restarted at the reset
        assert counts[1] == emitted              # untouched accumulation
        np.testing.assert_array_equal(got[1], ref[1])
        # slot 0's late normalization no longer carries the +5 pollution
        assert np.abs(got[0, -30:] - ref[0, -30:]).max() > 0.5

    def test_warmup_rows_grows_with_windowed_cmvn(self):
        cfg = dataclasses.replace(KALDI39, cmvn="sliding",
                                  cmvn_window=150, cmvn_min_window=40)
        pipe = streaming.StreamingPipeline(cfg, batch_size=1)
        assert pipe.warmup_rows == 8 + 150


class TestOnlineCmvnResetRows:
    @staticmethod
    def _stats(D, seed, count=200.0):
        from tpufeat import data
        rng = np.random.default_rng(seed)
        st = data.CmvnStats(D)
        st.count = count
        mean = rng.standard_normal(D) * 2.0
        var = rng.uniform(0.5, 4.0, D)
        st.sum = mean * count
        st.sumsq = (var + mean * mean) * count
        return st

    def test_priors_reengage_per_row(self):
        D, b = 13, 2
        spk = self._stats(D, seed=30)
        rng = np.random.default_rng(31)
        pre = rng.standard_normal((b, 150, D)).astype(np.float32) + 3.0
        post = rng.standard_normal((b, 80, D)).astype(np.float32)

        ref = streaming.OnlineCmvn(D, batch_size=b, window=100,
                                   speaker_stats=spk, norm_vars=True)
        ref.process(pre)
        want_ref = np.asarray(ref.process(post))

        oc = streaming.OnlineCmvn(D, batch_size=b, window=100,
                                  speaker_stats=spk, norm_vars=True)
        oc.process(pre)
        oc.reset_rows([0])
        got = np.asarray(oc.process(post))
        # row 1: bit-identical to the un-reset run
        np.testing.assert_array_equal(got[1], want_ref[1])
        # row 0: == a FRESH OnlineCmvn (same priors) fed only `post` —
        # per-utterance restart semantics
        fresh = streaming.OnlineCmvn(D, batch_size=b, window=100,
                                     speaker_stats=spk, norm_vars=True)
        want0 = np.asarray(fresh.process(post))[0]
        np.testing.assert_allclose(got[0], want0, atol=2e-5, rtol=0)
        # and it differs from the polluted continuation
        assert np.abs(got[0] - want_ref[0]).max() > 0.1

    def test_scalar_checkpoint_compat(self, tmp_path):
        """Old checkpoints stored one shared host int for n_seen."""
        oc = streaming.OnlineCmvn(5, batch_size=2, window=50,
                                  global_stats=self._stats(5, seed=32))
        s = oc.state()
        s["n_seen"] = 7                          # pre-per-row layout
        path = str(tmp_path / "oc.npz")
        streaming.save_state(path, s)
        oc2 = streaming.OnlineCmvn(5, batch_size=2, window=50,
                                   global_stats=self._stats(5, seed=32))
        oc2.set_state(streaming.load_state(path, oc2.state()))
        assert np.asarray(oc2.n_seen).tolist() == [7, 7]


class TestResamplerResetRows:
    def test_silence_prefix_exact(self):
        from tpufeat.resampling import StreamingResampler
        b = 2
        plan = [4800, 9600, 4800, 9600]
        x = _sig(b, sum(plan), 40)
        ref = _run_plan(StreamingResampler(48000, 16000, b), x, plan)
        sr = StreamingResampler(48000, 16000, b)
        got = _run_plan(sr, x, plan, reset_at=1)
        np.testing.assert_array_equal(got[1], ref[1])
        pre = sum(plan[:2])
        xz = x.copy()
        xz[0, :pre] = 0.0
        oracle = _run_plan(StreamingResampler(48000, 16000, b), xz, plan)
        assert got.shape == oracle.shape
        # the carry holds raw input samples, so zeroing it == the oracle's
        # zero-input tail BITWISE: every post-reset output sample matches
        pre_out = sum(plan[:2]) // 3             # samples out pre-reset
        np.testing.assert_array_equal(got[0, pre_out:], oracle[0, pre_out:])


class TestStreamPool:
    def test_lease_recycle_and_trim(self):
        b = 3
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        pool = streaming.StreamPool(pipe)
        assert pool.capacity == 3 and pool.free_slots == 3
        s0 = pool.attach()
        s1 = pool.attach()
        assert sorted([s0, s1]) == pool.active
        x = _sig(b, 9600, 50)
        out1 = pool.process({s0: x[s0, :4800], s1: x[s1, :4800]})
        out2 = pool.process({s0: x[s0, 4800:], s1: x[s1, 4800:]})
        # warmup trimming: first warmup_rows dropped once, then full rows
        n1 = MFCC13_HTK.num_frames(4800) - 4     # pipeline delta lag
        assert out1[s0].shape[0] == max(0, n1 - pipe.warmup_rows)
        assert out2[s0].shape[0] == out2[s1].shape[0]
        # recycle: detach then attach returns the slot with fresh warmup
        pool.detach(s1)
        assert pool.free_slots == 2
        s2 = pool.attach()
        assert s2 == s1                          # LIFO recycle
        out3 = pool.process({s0: x[s0, :4800], s2: x[s2, :4800]})
        n3 = out3[s0].shape[0]
        assert out3[s2].shape[0] == max(0, n3 - pipe.warmup_rows)

    def test_pool_errors(self):
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=1)
        pool = streaming.StreamPool(pipe)
        slot = pool.attach()
        with pytest.raises(RuntimeError, match="full"):
            pool.attach()
        with pytest.raises(KeyError, match="not attached"):
            pool.process({slot + 1: np.zeros(1600, np.float32)})
        with pytest.raises(KeyError, match="not attached"):
            pool.detach(slot + 1)
        with pytest.raises(ValueError, match="at least one"):
            pool.process({})
        pool.detach(slot)

    def test_pool_over_frontend(self):
        """StreamPool works over the bare StreamingFrontend too (no
        deltas -> warmup 0, every row returned)."""
        fe = streaming.StreamingFrontend(MFCC13_HTK, batch_size=2)
        pool = streaming.StreamPool(fe)
        assert pool.warmup == 0
        s = pool.attach()
        x = _sig(2, 4800, 51)
        out = pool.process({s: x[s]})
        assert out[s].shape == (MFCC13_HTK.num_frames(4800),
                                MFCC13_HTK.feature_dim)

    def test_process_batch_matches_dict_path(self):
        """process_batch (caller-assembled [capacity, C] block — the
        data-plane shape at serving scale) returns bit-identical rows to
        the dict path when fed the same content, and covers ALL attached
        slots including unfed-this-tick ones."""
        b = 3
        pool = streaming.StreamPool(
            streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b))
        pool_b = streaming.StreamPool(
            streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b))
        s0 = pool.attach(); s1 = pool.attach()
        assert (pool_b.attach(), pool_b.attach()) == (s0, s1)
        x = _sig(b, 9600, 55)
        x[2] = 0.0                                # slot 2 unleased
        for lo, hi in ((0, 4800), (4800, 9600)):
            want = pool.process({s0: x[s0, lo:hi], s1: x[s1, lo:hi]})
            got = pool_b.process_batch(x[:, lo:hi])
            assert sorted(got) == sorted(want)
            for s in want:
                np.testing.assert_array_equal(np.asarray(got[s]),
                                              np.asarray(want[s]))
        with pytest.raises(ValueError, match="capacity"):
            pool_b.process_batch(np.zeros((b + 1, 4800), np.float32))

    def test_poolrows_lazy_mapping_and_block(self):
        """The tick result is a LAZY PoolRows mapping (per-slot slicing on
        the relay costs ~2 ms x B — pool_overhead.py measured 870 ms/tick
        at B=1024): mapping semantics match the old dict, block() exposes
        the whole batched array + skips for the one-fetch bulk path, and
        the warmup skips are a per-tick SNAPSHOT (later ticks that mutate
        the pool's counters don't corrupt an earlier tick's view)."""
        b = 3
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        pool = streaming.StreamPool(pipe)
        s0, s1 = pool.attach(), pool.attach()
        x = _sig(b, 9600, 56)
        rows1 = pool.process({s0: x[s0, :4800], s1: x[s1, :4800]})
        assert isinstance(rows1, streaming.PoolRows)
        assert sorted(rows1) == sorted([s0, s1]) and len(rows1) == 2
        assert s0 in rows1 and 99 not in rows1   # Mapping __contains__
        out, skips = rows1.block()
        assert out.shape[0] == b and sorted(skips) == sorted([s0, s1])
        # snapshot: run tick 2 (which zeroes the pool's live skip
        # counters), then read tick 1's view — must still trim warmup
        rows2 = pool.process({s0: x[s0, 4800:], s1: x[s1, 4800:]})
        host = np.asarray(out)
        for s in rows1:
            np.testing.assert_array_equal(np.asarray(rows1[s]),
                                          host[s, skips[s]:])
        assert skips[s0] == pipe.warmup_rows     # tick-1 trim preserved
        o2, sk2 = rows2.block()
        assert sk2[s0] == 0                      # warmup consumed by tick 1
        np.testing.assert_array_equal(np.asarray(rows2[s0]),
                                      np.asarray(o2)[s0])

    def test_recycled_slot_matches_zeros_prefix_oracle(self):
        """End-to-end serving semantics: a slot detached and re-leased
        produces, after warmup, exactly the features of a zeros-prefix
        stream carrying the new caller's audio."""
        b = 2
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        pool = streaming.StreamPool(pipe)
        a, c = pool.attach(), pool.attach()
        xa = _sig(1, 19200, 52)[0]
        xc = _sig(1, 19200, 53)[0]
        pool.process({a: xa[:4800], c: xc[:4800]})
        pool.process({a: xa[4800:9600], c: xc[4800:9600]})
        pool.detach(c)
        c2 = pool.attach()                       # new caller on the slot
        xnew = _sig(1, 9600, 54)[0]
        got = [pool.process({a: xa[9600 + i: 14400 + i],
                             c2: xnew[i: 4800 + i]})[c2]
               for i in (0, 4800)]
        got = np.concatenate([np.asarray(g) for g in got], axis=0)
        # oracle: fresh pipeline fed zeros for the pre-attach span (same
        # batch size so the compiled programs match bitwise)
        oracle = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b)
        zx = np.concatenate([np.zeros(9600, np.float32), xnew])
        want = []
        for i in range(0, 19200, 4800):
            want.append(np.asarray(
                oracle.process(np.stack([zx, zx])[:, i: i + 4800])))
        want = np.concatenate(want, axis=1)[0]
        f_pre = MFCC13_HTK.num_frames(9600)
        want_rows = want[f_pre + pipe.warmup_rows:]
        np.testing.assert_array_equal(got[-want_rows.shape[0]:]
                                      if want_rows.shape[0] else got[:0],
                                      want_rows)



class TestPoolWithIvector:
    """StreamPool is wrapper-generic: an ivector-composed pipeline's
    slots lease/recycle like any other, and a recycled slot's i-vector
    columns restart at the prior (fresh-utterance adaptation)."""

    def test_pool_over_ivector_pipeline(self):
        from tpufeat import ivector as iv
        b = 3
        base_cfg = dataclasses.replace(KALDI39, deltas=False, cmvn="none")
        train = np.asarray(features.extract(
            _sig(2, 16000, 70), cfg=base_cfg).features).reshape(-1, 13)
        ubm = iv.train_diag_ubm(train, 4, iters=2, final_iters=3, seed=0)
        ext = iv.train_ivector_extractor(ubm, [train[::2], train[1::2]],
                                         ivector_dim=3, iters=2, seed=1)
        pipe = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=b,
                                           ivector=ext)
        pool = streaming.StreamPool(pipe)
        s0 = pool.attach()
        x = _sig(b, 9600, 71)
        rows = pool.process({s0: x[s0, :4800]})
        out, skips = rows.block()
        assert out.shape == (b, out.shape[1], 39 + 3)
        # recycle and confirm the slot's restart matches a fresh pipeline
        pool.detach(s0)
        s1 = pool.attach()
        assert s1 == s0
        rows2 = pool.process({s1: x[s1, :4800]})
        # zeros-prefix oracle (the documented recycle contract) for the
        # spectral columns; the i-vector stage differs deliberately —
        # reset_rows restarts ADAPTATION (fresh-utterance semantics)
        # while a zeros-prefix stream has adapted to silence — so mirror
        # the reset on the oracle's i-vector stage after the zero tick
        fresh = streaming.StreamingPipeline(KALDI39_NOCMVN, batch_size=1,
                                            ivector=ext)
        fresh.process(np.zeros((1, 4800), np.float32))
        fresh._ivector.reset()
        fresh._iv_fifo = fresh._iv_fifo * 0.0
        want = np.asarray(fresh.process(x[None, s1, :4800]))[0]
        got = np.asarray(rows2[s1])
        skip = pipe.warmup_rows
        np.testing.assert_allclose(got, want[skip:][: got.shape[0]],
                                   atol=1e-5)
