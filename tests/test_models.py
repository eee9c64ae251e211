"""Config-5 encoders: shapes, mask invariance, end-to-end CTC training step
(SURVEY.md §7 step 10)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufeat import features
from tpufeat.config import WHISPER80
from tpufeat.models import encoder as enc_lib
from tpufeat.models import train as train_lib

from conftest import make_signal


class TestEncoders:
    @pytest.mark.parametrize("arch", ["whisper", "conformer"])
    def test_shapes(self, arch):
        B, T, D = 2, 100, 80
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
        mask = jnp.ones((B, T), bool)
        if arch == "whisper":
            enc = enc_lib.WhisperEncoder(dim=64, layers=2, heads=2)
        else:
            enc = enc_lib.ConformerEncoder(dim=64, layers=2, heads=2)
        params = enc.init(jax.random.PRNGKey(0), mel, mask)
        out, m2 = enc.apply(params, mel, mask)
        assert out.shape == (B, 50, 64)
        assert m2.shape == (B, 50)

    def test_mask_invariance(self):
        """Padding frames must not change valid encoder outputs."""
        B, T, D = 1, 64, 80
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((B, T, D)).astype(np.float32)
        mask = np.zeros((B, T), bool)
        mask[:, :40] = True
        enc = enc_lib.WhisperEncoder(dim=32, layers=1, heads=2)
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(mel),
                          jnp.asarray(mask))
        a, _ = enc.apply(params, jnp.asarray(mel), jnp.asarray(mask))
        mel2 = mel.copy()
        mel2[:, 40:] = 123.0  # garbage in padding
        b, _ = enc.apply(params, jnp.asarray(mel2), jnp.asarray(mask))
        # encoders zero padded frames at the input, so padding contents are
        # fully inert: outputs identical everywhere
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_sinusoids(self):
        s = enc_lib.sinusoids(10, 8)
        assert s.shape == (10, 8)
        np.testing.assert_allclose(s[0], [0, 0, 0, 0, 1, 1, 1, 1], atol=1e-7)


class TestTrainStep:
    def test_loss_decreases(self):
        import functools
        import optax
        cfg = dataclasses.replace(WHISPER80, use_pallas=False)
        model = train_lib.make_models(dim=32, layers=1, heads=2, vocab=12)
        tx = optax.adamw(3e-3)
        rng = np.random.default_rng(2)
        B, n = 2, 8000
        audio = jnp.asarray((rng.standard_normal((B, n)) * 0.1)
                            .astype(np.float32))
        lengths = jnp.full((B,), n, jnp.int32)
        labels = jnp.asarray(rng.integers(1, 12, (B, 5)), jnp.int32)
        label_lengths = jnp.full((B,), 5, jnp.int32)

        res = features.extract_impl(audio, lengths, cfg)
        params = model.init(jax.random.PRNGKey(0), res.features, res.mask)
        state = train_lib.TrainState(params, tx.init(params),
                                     jnp.zeros((), jnp.int32))
        step = jax.jit(functools.partial(train_lib.ctc_train_step,
                                         model=model, tx=tx, cfg=cfg))
        losses = []
        for _ in range(5):
            state, loss = step(state, audio, lengths, labels, label_lengths)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses

    def test_checkpoint_roundtrip(self, tmp_path):
        import optax
        cfg = dataclasses.replace(WHISPER80, use_pallas=False)
        model = train_lib.make_models(dim=16, layers=1, heads=2, vocab=8)
        tx = optax.adamw(1e-4)
        sig = make_signal(4000, seed=5)
        res = features.extract_impl(jnp.asarray(sig)[None],
                                    jnp.array([4000]), cfg)
        params = model.init(jax.random.PRNGKey(0), res.features, res.mask)
        state = train_lib.TrainState(params, tx.init(params),
                                     jnp.zeros((), jnp.int32))
        path = str(tmp_path / "ckpt")
        train_lib.save_train_state(path, state)
        restored = train_lib.load_train_state(path, state)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_asr_forward_from_audio(self):
        cfg = dataclasses.replace(WHISPER80, use_pallas=False)
        model = train_lib.make_models(dim=32, layers=1, heads=2, vocab=12,
                                      arch="conformer")
        sig = make_signal(8000, seed=3)
        audio = jnp.asarray(sig)[None]
        lengths = jnp.array([8000], jnp.int32)
        res = features.extract_impl(audio, lengths, cfg)
        params = model.init(jax.random.PRNGKey(0), res.features, res.mask)
        logits, mask = train_lib.asr_forward(params, model, audio, lengths,
                                             cfg)
        assert logits.shape[0] == 1 and logits.shape[2] == 12
        assert np.isfinite(np.asarray(logits)).all()


class TestDecode:
    def test_greedy_ctc_collapse(self):
        # logits argmax sequence: [1, 1, 0, 2, 2, 3] -> [1, 2, 3]
        V = 4
        path = [1, 1, 0, 2, 2, 3]
        logits = np.full((1, len(path), V), -10.0, np.float32)
        for t, k in enumerate(path):
            logits[0, t, k] = 10.0
        mask = np.ones((1, len(path)), bool)
        out = train_lib.greedy_ctc_decode(jnp.asarray(logits),
                                          jnp.asarray(mask))
        assert out == [[1, 2, 3]]

    def test_greedy_respects_mask(self):
        V = 4
        logits = np.full((1, 4, V), -10.0, np.float32)
        logits[0, :, 1] = 10.0
        mask = np.array([[True, True, False, False]])
        out = train_lib.greedy_ctc_decode(jnp.asarray(logits),
                                          jnp.asarray(mask))
        assert out == [[1]]


class TestErrorRate:
    def test_edit_distance_cases(self):
        ed = train_lib.edit_distance
        assert ed([], []) == 0
        assert ed([1, 2, 3], [1, 2, 3]) == 0
        assert ed([1, 2, 3], []) == 3
        assert ed([], [7]) == 1
        assert ed([1, 2, 3], [1, 9, 3]) == 1       # substitution
        assert ed([1, 2, 3], [1, 3]) == 1          # deletion
        assert ed([1, 3], [1, 2, 3]) == 1          # insertion
        # classic: kitten -> sitting = 3
        assert ed("kitten", "sitting") == 3

    def test_edit_distance_matches_brute_force(self):
        rng = np.random.default_rng(4)
        for _ in range(25):
            a = rng.integers(0, 4, rng.integers(0, 7)).tolist()
            b = rng.integers(0, 4, rng.integers(0, 7)).tolist()
            # brute force over recursion with memo
            import functools

            @functools.lru_cache(maxsize=None)
            def f(i, j):
                if i == 0:
                    return j
                if j == 0:
                    return i
                return min(f(i - 1, j) + 1, f(i, j - 1) + 1,
                           f(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
            assert train_lib.edit_distance(a, b) == f(len(a), len(b))

    def test_token_error_rate(self):
        out = train_lib.token_error_rate([[1, 2, 3], [4]], [[1, 3], [4]])
        assert out == {"ter": 0.25, "errors": 1, "sub": 0, "ins": 0,
                       "del": 1, "ref_tokens": 4, "utterances": 2}
        assert train_lib.token_error_rate([[]], [[1]])["ter"] == float("inf")
        assert train_lib.token_error_rate([], [])["ter"] == 0.0
        import pytest
        with pytest.raises(ValueError):
            train_lib.token_error_rate([[1]], [])

    def test_edit_alignment_breakdown(self):
        # kitten -> sitting: 2 sub (k->s, e->i) + 1 ins (g)
        assert train_lib.edit_alignment("kitten", "sitting") == (2, 1, 0)
        assert train_lib.edit_alignment([1, 2], [1, 2]) == (0, 0, 0)
        assert train_lib.edit_alignment([1, 2], []) == (0, 0, 2)
        assert train_lib.edit_alignment([], [9, 9]) == (0, 2, 0)
        # counts always sum to the distance (random cross-check)
        rng = np.random.default_rng(6)
        for _ in range(25):
            a = rng.integers(0, 3, rng.integers(0, 8)).tolist()
            b = rng.integers(0, 3, rng.integers(0, 8)).tolist()
            assert sum(train_lib.edit_alignment(a, b)) == \
                train_lib.edit_distance(a, b)

    def test_end_to_end_with_decode(self):
        # logits that greedy-decode to the reference -> TER 0
        logits = np.full((1, 6, 5), -10.0, np.float32)
        for t, tok in enumerate([1, 1, 0, 2, 3, 3]):
            logits[0, t, tok] = 10.0
        hyp = train_lib.greedy_ctc_decode(jnp.asarray(logits),
                                      np.ones((1, 6), bool))
        assert train_lib.token_error_rate([[1, 2, 3]], hyp)["ter"] == 0.0


class TestTransducerLoss:
    """RNN-T loss vs brute-force alignment enumeration + autodiff."""

    @staticmethod
    def _brute(lp, labels, T, U, blank=0):
        """-log sum over all monotonic alignments (the float64 golden,
        now in reference/cpu.py per the repo convention)."""
        from tpufeat.reference import cpu
        return cpu.transducer_loss(lp, labels, T, U, blank)

    def _case(self, seed, B=3, T=4, U=2, V=5):
        import jax
        r = np.random.default_rng(seed)
        logits = r.standard_normal((B, T, U + 1, V)).astype(np.float32)
        labels = r.integers(1, V, (B, U)).astype(np.int32)
        tlen = np.array([T, T - 1, T])[:B]
        llen = np.array([U, U, U - 1])[:B]
        return logits, labels, tlen, llen

    def test_matches_brute_force(self):
        import jax
        from tpufeat.models import train
        logits, labels, tlen, llen = self._case(0)
        got = np.asarray(train.transducer_loss(logits, tlen, labels,
                                               llen))
        lp = np.asarray(jax.nn.log_softmax(
            np.asarray(logits, np.float64), axis=-1))
        for b in range(3):
            want = self._brute(lp[b], tuple(labels[b]), int(tlen[b]),
                               int(llen[b]))
            np.testing.assert_allclose(got[b], want, rtol=1e-5)

    def test_padding_invariance(self):
        from tpufeat.models import train
        logits, labels, tlen, llen = self._case(1)
        base = np.asarray(train.transducer_loss(logits, tlen, labels,
                                                llen))
        r = np.random.default_rng(2)
        padded = np.concatenate(
            [logits, r.standard_normal((3, 2, 3, 5)).astype(np.float32)],
            axis=1)                              # extra frames
        np.testing.assert_allclose(
            np.asarray(train.transducer_loss(padded, tlen, labels,
                                             llen)), base, rtol=1e-5)

    def test_gradients_match_finite_differences(self):
        import jax
        from tpufeat.models import train
        logits, labels, tlen, llen = self._case(3, B=2)
        tlen, llen = tlen[:2], llen[:2]

        def f(lg):
            return train.transducer_loss(lg, tlen, labels[:2],
                                         llen).sum()

        g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
        eps = 1e-3
        r = np.random.default_rng(4)
        for _ in range(6):
            ix = tuple(r.integers(0, s) for s in logits.shape)
            lp, lm = logits.copy(), logits.copy()
            lp[ix] += eps
            lm[ix] -= eps
            fd = (float(f(jnp.asarray(lp))) - float(f(jnp.asarray(lm))))\
                / (2 * eps)
            np.testing.assert_allclose(g[ix], fd, atol=2e-3)

    def test_greedy_decode_roundtrip(self):
        """A joint that deterministically prefers the reference labels
        once per frame decodes them back."""
        from tpufeat.models import train
        V, T = 6, 4
        ref = [2, 5, 1]

        def joint(frame, history):
            v = np.full(V, -10.0)
            if len(history) < len(ref) and len(history) <= int(frame[0]):
                v[ref[len(history)]] = 5.0   # emit next label
            v[0] = 0.0                       # then blank
            return v

        enc = np.arange(T, dtype=np.float32)[:, None]
        out = train.greedy_transducer_decode(joint, enc,
                                             np.ones(T, bool))
        assert out == ref


class TestTransducerTraining:
    @pytest.mark.slow  # ~21 s EM-ish loop; the dp-sharded RNN-T step also runs in the driver dryrun, and TestTransducerLoss keeps gradient coverage
    def test_loss_decreases_and_dp_shards(self):
        """End-to-end RNN-T step: raw audio -> front-end -> encoder ->
        stateless predictor -> joint -> loss; a few steps reduce the
        loss, and the dp-sharded step matches unsharded on the fake
        mesh."""
        import dataclasses
        import jax
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from tpufeat.config import WHISPER80
        from tpufeat.models import train
        from tpufeat.sharding import default_mesh
        cfg = dataclasses.replace(WHISPER80, use_pallas=False)
        r = np.random.default_rng(0)
        B, n, U = 2, 4000, 3
        audio = jnp.asarray(
            (0.1 * r.standard_normal((B, n))).astype(np.float32))
        lengths = jnp.full((B,), n, jnp.int32)
        labels = jnp.asarray(r.integers(1, 12, (B, U)), jnp.int32)
        llen = jnp.full((B,), U, jnp.int32)
        model = train.make_transducer(dim=32, layers=1, heads=2,
                                      vocab=12, arch="whisper")
        res = train.features.extract_impl(audio, lengths, cfg)
        params = model.init(jax.random.PRNGKey(0), res.features,
                            res.mask, labels)
        tx = optax.adam(3e-3)
        state = train.TrainState(params, tx.init(params),
                                 jnp.zeros((), jnp.int32))
        step = jax.jit(lambda s, a: train.transducer_train_step(
            s, a, lengths, labels, llen, model=model, tx=tx, cfg=cfg))
        losses = []
        for _ in range(8):
            state, loss = step(state, audio)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        # dp sharding is an annotation: same loss from sharded rows
        mesh = default_mesh()
        a8 = jnp.tile(audio, (4, 1))
        state8 = train.TrainState(params, tx.init(params),
                                  jnp.zeros((), jnp.int32))
        step8 = jax.jit(lambda s, a: train.transducer_train_step(
            s, a, jnp.tile(lengths, 4), jnp.tile(labels, (4, 1)),
            jnp.tile(llen, 4), model=model, tx=tx, cfg=cfg))
        _, l_plain = step8(state8, a8)
        _, l_shard = step8(state8, jax.device_put(
            a8, NamedSharding(mesh, P("dp"))))
        np.testing.assert_allclose(float(l_shard), float(l_plain),
                                   rtol=1e-5)


class TestBeamTransducerDecode:
    @staticmethod
    def _joint_table(T, U_max, V, seed):
        """A fixed random joint over (frame index, history length)."""
        r = np.random.default_rng(seed)
        table = r.standard_normal((T, U_max + 1, V)) * 2.0
        # once U_max labels are out, blank dominates — so the global
        # argmax really lives inside the exhaustively-enumerated set
        table[:, U_max, 0] += 12.0

        def joint(frame, history):
            u = min(len(history), U_max)
            return table[int(frame[0]), u]

        return joint, table

    @staticmethod
    def _exhaustive_best(joint, enc, T, V, max_u, blank=0):
        """Brute force: enumerate ALL label sequences up to max_u and
        sum alignment probabilities exactly; return the argmax."""
        import itertools
        import functools

        def seq_logp(lab):
            U = len(lab)

            @functools.lru_cache(maxsize=None)
            def p(t, u):
                logits = np.asarray(joint(enc[t], list(lab[:u])),
                                    np.float64)
                lp = logits - np.logaddexp.reduce(logits)
                if t == T - 1 and u == U:
                    return lp[blank]
                outs = []
                if t < T - 1:
                    outs.append(lp[blank] + p(t + 1, u))
                if u < U:
                    outs.append(lp[lab[u]] + p(t, u + 1))
                return np.logaddexp.reduce(np.asarray(outs))

            return p(0, 0)

        best, best_lp = (), -np.inf
        for U in range(max_u + 1):
            for lab in itertools.product(range(1, V), repeat=U):
                lp = seq_logp(lab)
                if lp > best_lp:
                    best, best_lp = lab, lp
        return list(best)

    def test_matches_exhaustive_on_tiny(self):
        from tpufeat.models import train
        T, V, max_u = 3, 3, 2
        for seed in (0, 1, 2, 3):
            joint, _ = self._joint_table(T, max_u, V, seed)
            enc = np.arange(T, dtype=np.float32)[:, None]
            got = train.beam_transducer_decode(joint, enc,
                                               np.ones(T, bool),
                                               beam=8, max_symbols=max_u)
            want = self._exhaustive_best(joint, enc, T, V, max_u)
            assert got == want, (seed, got, want)

    def test_beats_or_matches_greedy(self):
        """With a beam wide enough for this tiny space (16 covers it;
        width 8 measurably prunes the optimum at seed 16), beam search
        is exact where greedy is not."""
        from tpufeat.models import train
        T, V, max_u = 4, 4, 3
        wins = 0
        for seed in (10, 11, 12, 16, 17, 18):   # 16: greedy-divergent
            joint, _ = self._joint_table(T, max_u, V, seed)
            enc = np.arange(T, dtype=np.float32)[:, None]
            b = train.beam_transducer_decode(joint, enc,
                                             np.ones(T, bool), beam=16,
                                             max_symbols=max_u)
            g = train.greedy_transducer_decode(joint, enc,
                                               np.ones(T, bool),
                                               max_symbols=max_u)
            want = self._exhaustive_best(joint, enc, T, V, max_u)
            assert b == want, (seed, b, want)
            wins += int(g != want)
        assert wins >= 1     # beam actually corrects greedy somewhere


class TestPrefixBeamCtc:
    def test_exact_vs_exhaustive(self):
        import itertools
        import jax
        from tpufeat.models import train
        from tpufeat.reference import cpu
        T, V = 4, 3
        for seed in range(6):
            r = np.random.default_rng(seed)
            lp = np.asarray(jax.nn.log_softmax(
                jnp.asarray(r.standard_normal((T, V)) * 2.0), axis=-1))
            best, best_lp = [], -np.inf
            for L in range(T + 1):
                for seq in itertools.product(range(1, V), repeat=L):
                    # skip impossible (CTC needs >= L + repeats frames)
                    v = cpu.ctc_sequence_logp(lp, seq)
                    if v > best_lp:
                        best, best_lp = list(seq), v
            got = train.prefix_beam_ctc_decode(lp, np.ones(T, bool),
                                               beam=64)
            assert got == best, (seed, got, best)

    def test_collapses_repeats_and_mask(self):
        from tpufeat.models import train
        # [a a blank a] must decode to "a a" (repeat split by blank)
        lp = np.log(np.full((4, 2), 1e-6))
        lp[0, 1] = lp[1, 1] = lp[3, 1] = np.log(0.999)
        lp[2, 0] = np.log(0.999)
        out = train.prefix_beam_ctc_decode(lp, np.ones(4, bool), beam=8)
        assert out == [1, 1]
        # masked tail ignored
        out2 = train.prefix_beam_ctc_decode(
            lp, np.array([True, True, False, False]), beam=8)
        assert out2 == [1]
