"""Native C++ Viterbi encoder must agree with the python implementation."""

import os
import subprocess

import pytest

from speech_anonymization_tpu.data.tokenizer import UnigramTokenizer

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)


CORPUS = [
    "THE CAT SAT ON THE MAT",
    "THE DOG SAT ON THE LOG",
    "HELLO WORLD SPEECH MODEL TEST AUDIO",
    "A CAT AND A DOG AND A LOG",
] * 4


def test_native_matches_python():
    tok = UnigramTokenizer().train(CORPUS, vocab_size=96)
    assert tok._native is not None, "native encoder did not bind"
    sentences = CORPUS + ["THE SPEECH LOG", "CAT DOG MAT", "QZX UNSEEN"]
    for s in sentences:
        native_ids = tok.encode_as_ids(s)
        tok_py = UnigramTokenizer()
        tok_py.pieces, tok_py.log_probs = tok.pieces, tok.log_probs
        tok_py._ids = {p: i + len(tok.RESERVED) for i, p in enumerate(tok.pieces)}
        tok_py._native = None
        py_ids = tok_py.encode_as_ids(s)
        assert native_ids == py_ids, (s, native_ids, py_ids)
        # roundtrip through decode for known sentences
        if "QZX" not in s:
            assert tok.decode_ids(native_ids) == s


def test_native_encoder_speed_sanity():
    import time

    tok = UnigramTokenizer().train(CORPUS, vocab_size=96)
    text = "THE CAT SAT ON THE MAT AND THE DOG SAT ON THE LOG " * 20
    t0 = time.perf_counter()
    for _ in range(200):
        tok.encode_as_ids(text)
    native_t = time.perf_counter() - t0
    tok._native = None
    t0 = time.perf_counter()
    for _ in range(200):
        tok.encode_as_ids(text)
    py_t = time.perf_counter() - t0
    assert native_t < py_t, f"native {native_t:.3f}s not faster than python {py_t:.3f}s"
