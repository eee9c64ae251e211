"""torch DataLoader integration (tpufeat/compat.py: TorchWavDataset +
pad_collate + FeatureLoader) — decode in workers, extract in the main
process, features out as torch tensors."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import tpufeat.io as tio
from tpufeat import compat, features
from tpufeat.config import KALDI39, MFCC13_HTK


@pytest.fixture()
def wav_dir(tmp_path):
    rng = np.random.default_rng(42)
    paths = []
    for i, n in enumerate([12000, 16000, 7000, 20000, 9000]):
        sig = (0.3 * rng.standard_normal(n)).astype(np.float32)
        p = tmp_path / f"utt{i}.wav"
        tio.write_wav(str(p), sig, 16000)
        paths.append(str(p))
    return paths


class TestTorchIntegration:
    def test_dataset_items(self, wav_dir):
        ds = compat.TorchWavDataset(wav_dir)
        assert len(ds) == 5
        samples, key = ds[2]
        assert samples.dtype == np.float32 and len(samples) == 7000
        assert key == wav_dir[2]

    def test_pad_collate_buckets(self, wav_dir):
        ds = compat.TorchWavDataset(wav_dir)
        batch = compat.pad_collate([ds[0], ds[2]])
        assert batch["signal"].shape[0] == 2
        # 12000 -> sqrt(2) bucket of 16000-minimum grid
        assert batch["signal"].shape[1] == 16000
        np.testing.assert_array_equal(batch["lengths"], [12000, 7000])
        assert batch["keys"] == [wav_dir[0], wav_dir[2]]
        raw = compat.pad_collate([ds[0][0], ds[2][0]], bucket=False)
        assert raw["signal"].shape[1] == 12000
        assert raw["keys"] == [None, None]

    def test_feature_loader_matches_direct_extract(self, wav_dir):
        dl = torch.utils.data.DataLoader(
            compat.TorchWavDataset(wav_dir), batch_size=3, shuffle=False,
            num_workers=0, collate_fn=compat.pad_collate)
        fl = compat.FeatureLoader(dl, KALDI39)
        assert len(fl) == 2
        seen = 0
        for batch in fl:
            assert isinstance(batch["features"], torch.Tensor)
            assert batch["features"].dtype == torch.float32
            utts = [tio.read_wav(key)[0] for key in batch["keys"]]
            lens = [len(s) for s in utts]
            sig = np.zeros((len(utts), max(lens)), np.float32)
            for b, s in enumerate(utts):
                sig[b, : len(s)] = s
            ref = features.extract(sig, np.asarray(lens), KALDI39)
            nf = batch["num_frames"].numpy()
            np.testing.assert_array_equal(nf, np.asarray(ref.num_frames))
            got = batch["features"].numpy()
            want = np.asarray(ref.features)
            for b in range(got.shape[0]):
                np.testing.assert_allclose(got[b, : nf[b]],
                                           want[b, : nf[b]], atol=2e-5)
            seen += got.shape[0]
        assert seen == 5

    def test_feature_loader_np_mode_and_validation(self, wav_dir):
        dl = torch.utils.data.DataLoader(
            compat.TorchWavDataset(wav_dir[:2]), batch_size=2,
            num_workers=0, collate_fn=compat.pad_collate)
        batch = next(iter(compat.FeatureLoader(dl, MFCC13_HTK,
                                               return_type="np")))
        assert isinstance(batch["features"], np.ndarray)
        assert batch["features"].shape[-1] == 13
        with pytest.raises(ValueError):
            compat.FeatureLoader(dl, MFCC13_HTK, return_type="list")

    def test_rate_mismatch_raises(self, wav_dir, tmp_path):
        p = tmp_path / "8k.wav"
        tio.write_wav(str(p), np.zeros(800, np.float32), 8000)
        ds = compat.TorchWavDataset([str(p)])
        with pytest.raises(ValueError, match="sample rate 8000"):
            ds[0]
        ds_any = compat.TorchWavDataset([str(p)], expected_rate=None)
        assert len(ds_any[0][0]) == 800

    def test_dither_rng_fresh_per_batch(self, wav_dir):
        import dataclasses
        import jax
        cfg = dataclasses.replace(MFCC13_HTK, dither=1e-3)
        # two identical batches (same wav twice) must get DIFFERENT noise
        dl = torch.utils.data.DataLoader(
            compat.TorchWavDataset([wav_dir[0], wav_dir[0]]), batch_size=1,
            num_workers=0, collate_fn=compat.pad_collate)
        feats = [b["features"].numpy() for b in
                 compat.FeatureLoader(dl, cfg, rng=jax.random.key(0))]
        assert not np.array_equal(feats[0], feats[1])

    def test_worker_processes_decode(self, wav_dir):
        # decode in 2 worker processes (NumPy only there), extract in the
        # main process — the documented deployment split
        dl = torch.utils.data.DataLoader(
            compat.TorchWavDataset(wav_dir), batch_size=2, num_workers=2,
            collate_fn=compat.pad_collate)
        total = sum(b["features"].shape[0]
                    for b in compat.FeatureLoader(dl, MFCC13_HTK))
        assert total == 5
