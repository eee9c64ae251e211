"""X-vector network tests (tpufeat/models/xvector.py): masked stats
pooling invariance, training separates speakers, embeddings compose
with the PLDA backend, jit/bucket behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpufeat import plda as pl
from tpufeat.models import xvector as xv


def _batch(n_spk=4, n_utt=6, T=50, D=13, seed=0):
    r = np.random.default_rng(seed)
    offs = r.standard_normal((n_spk, D)) * 2.0
    feats, labels = [], []
    for s in range(n_spk):
        for _ in range(n_utt):
            feats.append(offs[s] + r.standard_normal((T, D)))
        labels += [s] * n_utt
    return (np.stack(feats).astype(np.float32),
            np.asarray(labels, np.int32))


@pytest.fixture(scope="module")
def trained():
    import optax
    feats, labels = _batch()
    model = xv.xvector_model(4, embed_dim=16, channels=32)
    mask = jnp.ones(feats.shape[:2], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats, mask)
    tx = optax.adam(3e-3)
    state = xv.XvectorState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(lambda s, f, m, l: xv.xvector_train_step(
        s, f, m, l, model=model, tx=tx))
    losses = []
    for _ in range(60):
        state, loss = step(state, feats, mask, labels)
        losses.append(float(loss))
    return model, state, feats, labels, losses


class TestTraining:
    def test_loss_decreases(self, trained):
        _, _, _, _, losses = trained
        assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    def test_embeddings_separate_speakers(self, trained):
        model, state, feats, labels, _ = trained
        emb = np.asarray(xv.extract_xvectors(state.params, model, feats))
        from scipy.spatial.distance import cdist
        d = cdist(emb, emb)
        np.fill_diagonal(d, 1e9)
        nn_acc = (labels[d.argmin(1)] == labels).mean()
        assert nn_acc > 0.9, nn_acc


class TestMasking:
    def test_padding_invariance(self, trained):
        """Padding frames must not change an utterance's embedding."""
        model, state, feats, _, _ = trained
        one = feats[:2]
        emb_short = np.asarray(xv.extract_xvectors(
            state.params, model, one, num_frames=[50, 30]))
        padded = np.concatenate(
            [one, 99.0 * np.ones((2, 37, one.shape[2]), np.float32)],
            axis=1)
        emb_pad = np.asarray(xv.extract_xvectors(
            state.params, model, padded, num_frames=[50, 30]))
        np.testing.assert_allclose(emb_pad, emb_short, atol=2e-4)

    def test_single_utterance_2d(self, trained):
        model, state, feats, _, _ = trained
        e = xv.extract_xvectors(state.params, model, feats[0])
        assert e.shape == (1, 16)


class TestPldaComposition:
    def test_xvector_plda_verification(self, trained):
        """The modern pipeline: x-vectors -> length-norm -> PLDA."""
        model, state, feats, labels, _ = trained
        emb = pl.length_normalize(np.asarray(
            xv.extract_xvectors(state.params, model, feats)))
        plda = pl.train_plda(emb, labels, iters=5)
        means, counts, spks = pl.ivector_mean(emb[::2], labels[::2])
        sc = np.asarray(plda.score(means, emb[1::2], n_enroll=counts))
        truth = labels[1::2]
        same = sc[np.asarray(spks)[:, None] == truth[None, :]]
        diff = sc[np.asarray(spks)[:, None] != truth[None, :]]
        auc = (same[:, None] > diff[None, :]).mean()
        assert auc > 0.95, auc


class TestDataParallel:
    def test_dp_sharded_train_step_matches(self, trained):
        """The train step is a pure function -> dp sharding is an
        annotation: batch rows sharded over the mesh produce the same
        loss and params as unsharded (8 fake devices, conftest)."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from tpufeat.sharding import default_mesh
        model, state, feats, labels, _ = trained
        mesh = default_mesh()
        mask = jnp.ones(feats.shape[:2], jnp.float32)
        tx = optax.adam(1e-3)
        s0 = xv.XvectorState(state.params, tx.init(state.params),
                             jnp.zeros((), jnp.int32))
        step = jax.jit(lambda s, f, m, l: xv.xvector_train_step(
            s, f, m, l, model=model, tx=tx))
        want_state, want_loss = step(s0, feats, mask, labels)
        shard = NamedSharding(mesh, P("dp"))
        fs = jax.device_put(feats, shard)
        ms = jax.device_put(mask, shard)
        ls = jax.device_put(jnp.asarray(labels), shard)
        got_state, got_loss = step(s0, fs, ms, ls)
        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-5)
        leaves = zip(jax.tree_util.tree_leaves(got_state.params),
                     jax.tree_util.tree_leaves(want_state.params))
        for a, b in leaves:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
