"""CLI integration (reference L4): WAV file -> CLI -> feature file."""

import json
import numpy as np
import pytest

from tpufeat import cli, io
from tpufeat.reference import cpu
from tpufeat.config import MFCC13_HTK

from conftest import make_signal


@pytest.fixture
def wav(tmp_path):
    sig = make_signal(16000, seed=120)
    path = str(tmp_path / "utt.wav")
    io.write_wav(path, sig, 16000)
    return path, sig


class TestCLI:
    def test_extract_npy(self, wav, tmp_path, capsys):
        path, sig = wav
        out = str(tmp_path / "out.npy")
        assert cli.main([path, out, "--preset", "mfcc13"]) == 0
        feats = np.load(out)
        # 16-bit quantization through the wav roundtrip: compare to golden
        # of the decoded samples
        decoded, _ = io.read_wav(path)
        gold = cpu.extract(decoded.astype(np.float64), MFCC13_HTK)
        assert feats.shape == gold.shape
        assert np.abs(feats - gold).max() < 1e-3

    def test_batch_npz_and_validate(self, wav, tmp_path, capsys):
        path, _ = wav
        sig2 = make_signal(8000, seed=121)
        path2 = str(tmp_path / "utt2.wav")
        io.write_wav(path2, sig2, 16000)
        out = str(tmp_path / "out.npz")
        assert cli.main([path, path2, out, "--preset", "whisper80",
                         "--validate"]) == 0
        data = np.load(out)
        assert data["features"].shape[0] == 2
        assert data["mask"].shape == data["features"].shape[:2]
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["max_abs_err"]["numpy_f64"] < 1e-3

    def test_overrides(self, wav, tmp_path):
        path, _ = wav
        out = str(tmp_path / "o.npy")
        assert cli.main([path, out, "--set", "n_mels=40",
                         "--set", "lifter=22"]) == 0
        assert np.load(out).shape[1] == 13

    def test_streaming_mode(self, wav, tmp_path):
        path, _ = wav
        out1 = str(tmp_path / "s.npy")
        out2 = str(tmp_path / "o.npy")
        assert cli.main([path, out1, "--stream", "1600"]) == 0
        assert cli.main([path, out2]) == 0
        a, b = np.load(out1), np.load(out2)
        assert a.shape == b.shape
        assert np.abs(a - b).max() < 1e-4

    def test_bad_override_rejected(self, wav, tmp_path):
        path, _ = wav
        with pytest.raises(SystemExit):
            cli.main([path, str(tmp_path / "o.npy"), "--set", "bogus=1"])

    def test_resample_flag(self, tmp_path, capsys):
        from tpufeat import cli, io
        from conftest import make_signal
        import numpy as np
        p = str(tmp_path / "a8k.wav")
        io.write_wav(p, make_signal(8000, seed=70), 8000)
        out = tmp_path / "o.npy"
        rc = cli.main([p, str(out), "--preset", "mfcc13", "--resample"])
        assert rc == 0
        feats = np.load(out)
        from tpufeat.config import MFCC13_HTK
        assert feats.shape == (MFCC13_HTK.num_frames(16000), 13)

    def test_wrong_sample_rate_rejected(self, tmp_path):
        path = str(tmp_path / "sr8k.wav")
        io.write_wav(path, make_signal(8000, seed=122), 8000)
        with pytest.raises(SystemExit):
            cli.main([path, str(tmp_path / "o.npy")])


def test_pitch_append(tmp_path):
    """--pitch appends 3 pitch dims on the shared hop grid."""
    from tpufeat import cli, io
    from conftest import make_signal
    wav = tmp_path / "a.wav"
    io.write_wav(str(wav), make_signal(16000, seed=70), 16000)
    out = tmp_path / "out.npy"
    cli.main([str(wav), str(out), "--pitch"])
    feats = np.load(str(out))
    assert feats.shape[1] == 16                  # 13 MFCC + 3 pitch
    assert np.isfinite(feats).all()


def test_pitch_rejects_htk_and_validate(tmp_path):
    from tpufeat import cli, io
    from conftest import make_signal
    wav = tmp_path / "a.wav"
    io.write_wav(str(wav), make_signal(8000, seed=71), 16000)
    import pytest
    with pytest.raises(SystemExit, match="pitch"):
        cli.main([str(wav), str(tmp_path / "o.htk"), "--pitch"])
    with pytest.raises(SystemExit, match="pitch"):
        cli.main([str(wav), str(tmp_path / "o.npy"), "--pitch",
                  "--validate"])
