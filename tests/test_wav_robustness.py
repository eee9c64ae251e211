"""Malformed-WAV robustness for BOTH RIFF decoders (C1).

The decoders parse untrusted bytes (corpus dirs, user uploads), so every
malformed input must end in a clean ValueError/IOError — never a crash,
never an attacker-sized allocation, never garbage samples. The C++
decoder is the sharp edge: a hostile `data` size field used to drive a
vector allocation (and, via the two-pass size probe, the caller's
np.zeros) before any file-size check; both decoders now clamp the data
chunk to the bytes actually present and decode whole frames only.

Structured malformations are exact; the mutation fuzz is seeded (no
flaky CI) and asserts the two decoders agree whenever both accept a
mutant — the same parity contract as test_cpp_golden, extended to the
adversarial neighborhood of a valid file.
"""

import struct

import numpy as np
import pytest

from tpufeat import io as tio
from tpufeat import cpp_golden


def _wav_bytes(n=10, rate=16000, fmt=1, channels=1, bits=16,
               data_size=None, payload=None, fmt_size=16,
               chunks_order=("fmt", "data")):
    """Hand-rolled WAV with every field overridable (malformable)."""
    if payload is None:
        payload = struct.pack(f"<{n}h", *range(-n // 2, n - n // 2))
    if data_size is None:
        data_size = len(payload)
    block = max(1, bits // 8) * max(1, channels)
    fmt_body = struct.pack("<HHIIHH", fmt, channels, rate,
                           rate * block, block, bits)
    fmt_body = fmt_body[:fmt_size].ljust(fmt_size, b"\x00")
    chunks = b""
    for c in chunks_order:
        if c == "fmt":
            chunks += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        elif c == "data":
            chunks += b"data" + struct.pack("<I", data_size) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _both(tmp_path, blob):
    """Run both decoders on the blob; return a {name: result-or-error}."""
    p = str(tmp_path / "f.wav")
    with open(p, "wb") as f:
        f.write(blob)
    out = {}
    for name, fn in [("py", lambda: tio.read_wav(p, native=False)),
                     ("cc", lambda: cpp_golden.read_wav_native(p))]:
        if name == "cc" and not cpp_golden.available():
            continue
        try:
            out[name] = fn()
        except (ValueError, IOError) as e:
            out[name] = e
    return out


REJECTS = {
    "empty": b"",
    "short": b"RIF",
    "not_wave": b"RIFF\x10\x00\x00\x00JUNKdata",
    "header_only": b"RIFF\x04\x00\x00\x00WAVE",
    "no_data_chunk": _wav_bytes(chunks_order=("fmt",)),
    "data_before_fmt": _wav_bytes(chunks_order=("data",)),
    "truncated_fmt": _wav_bytes(fmt_size=8),
    "zero_channels": _wav_bytes(channels=0),
    "zero_rate": _wav_bytes(rate=0),
    "bits_not_byte": _wav_bytes(bits=12),
    "unknown_tag": _wav_bytes(fmt=0x55),
    "alaw_tag": _wav_bytes(fmt=6),
    "truncated_extensible": _wav_bytes(fmt=0xFFFE),
}


class TestStructuredMalformations:
    @pytest.mark.parametrize("name", sorted(REJECTS))
    def test_rejected_cleanly(self, tmp_path, name):
        for dec, res in _both(tmp_path, REJECTS[name]).items():
            assert isinstance(res, Exception), \
                f"{dec} accepted malformed case {name!r}: {res}"

    @pytest.mark.parametrize("size", [0xFFFFFF00, 100])
    def test_hostile_data_size_clamps_to_file(self, tmp_path, size):
        """The size field claims far more than the file holds (4 GB for
        the hostile case): both decoders must decode exactly the whole
        frames present — no attacker-sized allocation, no error."""
        blob = _wav_bytes(n=10, data_size=size)  # 20 real payload bytes
        res = _both(tmp_path, blob)
        for dec, r in res.items():
            assert not isinstance(r, Exception), f"{dec}: {r}"
            samples, rate = r
            assert samples.shape == (10,) and rate == 16000
        if len(res) == 2:
            np.testing.assert_allclose(res["py"][0], res["cc"][0],
                                       atol=1e-7)

    def test_odd_trailing_byte_dropped(self, tmp_path):
        """A data chunk whose byte count is not a whole number of frames
        decodes the whole frames only (both decoders)."""
        blob = _wav_bytes(n=4, payload=struct.pack("<4h", 1, -2, 3, -4)
                          + b"\x77")
        for dec, r in _both(tmp_path, blob).items():
            assert not isinstance(r, Exception), f"{dec}: {r}"
            assert r[0].shape == (4,), dec


class TestMutationFuzz:
    """Seeded fuzz around a valid file: never crash, and whenever both
    decoders accept a mutant they must agree (rate, length, samples)."""

    def _base(self):
        rng = np.random.default_rng(0)
        sig = (0.3 * rng.standard_normal(300)).astype(np.float32)
        payload = np.clip(np.round(sig * 32768), -32768,
                          32767).astype("<i2").tobytes()
        return _wav_bytes(n=300, payload=payload)

    def test_byte_flips_and_truncations(self, tmp_path):
        base = bytearray(self._base())
        rng = np.random.default_rng(1)
        both_ok = 0
        for k in range(120):
            m = bytearray(base)
            if k % 3 == 0:                       # truncate
                m = m[: rng.integers(0, len(m))]
            else:                                # flip 1-4 bytes
                for _ in range(rng.integers(1, 5)):
                    m[rng.integers(0, len(m))] = rng.integers(0, 256)
            res = _both(tmp_path, bytes(m))
            oks = {d: r for d, r in res.items()
                   if not isinstance(r, Exception)}
            if len(oks) == len(res) == 2:
                (py_s, py_r), (cc_s, cc_r) = oks["py"], oks["cc"]
                assert py_r == cc_r
                assert py_s.shape == cc_s.shape
                np.testing.assert_allclose(py_s, cc_s, atol=1e-6)
                both_ok += 1
        assert both_ok > 10          # the fuzz actually exercised decodes

    def test_random_blobs_never_crash(self, tmp_path):
        rng = np.random.default_rng(2)
        for k in range(40):
            blob = rng.integers(0, 256, rng.integers(0, 2048),
                                dtype=np.uint8).tobytes()
            if k % 2:                            # half look RIFF-ish
                blob = b"RIFF" + blob[:4] + b"WAVE" + blob
            for dec, r in _both(tmp_path, blob).items():
                if not isinstance(r, Exception):
                    samples, rate = r
                    assert rate > 0 and samples.dtype == np.float32
