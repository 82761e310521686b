"""FLAC decoder test: roundtrip against a minimal in-test encoder.

The environment has no FLAC tools, so the test writes spec-compliant FLAC
with verbatim subframes (the simplest legal encoding) and checks the native
decoder (native/flac_decode.cc) reproduces the samples exactly.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

from speech_anonymization_tpu.data.audio import read_audio

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        for i in reversed(range(bits)):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def align(self):
        while self.nbits:
            self.write(0, 1)


def encode_flac_verbatim(samples: np.ndarray, sr=16000, block=256) -> bytes:
    """Mono 16-bit verbatim FLAC."""
    s16 = np.clip(np.asarray(samples) * 32767, -32768, 32767).astype(np.int64)
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    info = BitWriter()
    info.write(block, 16)  # min block
    info.write(block, 16)  # max block
    info.write(0, 24)      # min frame size (unknown)
    info.write(0, 24)      # max frame size
    info.write(sr, 20)
    info.write(0, 3)       # channels - 1
    info.write(15, 5)      # bits - 1
    info.write(len(s16), 36)
    info_bytes = bytes(info.bytes) + bytes(16)  # md5 zeros
    out += struct.pack(">B", 0x80)  # last-metadata, type 0
    out += struct.pack(">I", len(info_bytes))[1:]
    out += info_bytes

    n = len(s16)
    frame_no = 0
    for start in range(0, n, block):
        chunk = s16[start : start + block]
        bw = BitWriter()
        bw.write(0x3FFE, 14)  # sync
        bw.write(0, 1)        # reserved
        bw.write(0, 1)        # fixed blocksize stream
        bw.write(7, 4)        # block size: 16-bit at end of header
        bw.write(5, 4)        # sample rate 16 kHz
        bw.write(0, 4)        # channels: 1 (independent)
        bw.write(4, 3)        # sample size 16-bit
        bw.write(0, 1)        # reserved
        assert frame_no < 128
        bw.write(frame_no, 8)  # utf8 frame number (single byte)
        bw.write(len(chunk) - 1, 16)
        bw.write(0, 8)        # CRC-8 (decoder does not verify)
        # subframe: verbatim
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)        # no wasted bits
        for v in chunk:
            bw.write(int(v) & 0xFFFF, 16)
        bw.align()
        bw.write(0, 16)       # frame CRC-16 (not verified)
        out += bytes(bw.bytes)
        frame_no += 1
    return bytes(out)


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)


def test_flac_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(1000) * 0.3).astype(np.float32)
    path = str(tmp_path / "x.flac")
    with open(path, "wb") as f:
        f.write(encode_flac_verbatim(wav, block=256))
    decoded, sr = read_audio(path, return_sr=True)
    assert sr == 16000
    assert len(decoded) == 1000
    expected = np.clip(wav * 32767, -32768, 32767).astype(np.int64) / 32768.0
    np.testing.assert_allclose(decoded, expected, atol=1e-4)


def test_flac_short_tail_frame(tmp_path):
    wav = np.sin(np.linspace(0, 20, 777)).astype(np.float32) * 0.5
    path = str(tmp_path / "y.flac")
    with open(path, "wb") as f:
        f.write(encode_flac_verbatim(wav, block=256))
    decoded, sr = read_audio(path, return_sr=True)
    assert len(decoded) == 777
