"""sentencepiece .model protobuf reader (ADVICE round-1 #4).

Builds a real ModelProto wire-format file by hand (pieces field 1:
piece=1/score=2/type=3) and checks that load_sentencepiece adopts the
sentencepiece id space verbatim — the property ported reference ASR/LM
checkpoints rely on (their output layers are tied to the original vocab,
reference convae.yaml:316).
"""

import struct

import pytest

from speech_anonymization_tpu.data.tokenizer import UnigramTokenizer

# SentencePiece piece types
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _piece(piece: str, score: float, ptype: int) -> bytes:
    body = b""
    raw = piece.encode("utf-8")
    body += _varint((1 << 3) | 2) + _varint(len(raw)) + raw
    body += _varint((2 << 3) | 5) + struct.pack("<f", score)
    if ptype != NORMAL:  # NORMAL is the proto default and may be omitted
        body += _varint((3 << 3) | 0) + _varint(ptype)
    return _varint((1 << 3) | 2) + _varint(len(body)) + body


def _model_bytes(entries) -> bytes:
    data = b"".join(_piece(p, s, t) for p, s, t in entries)
    # trailing unrelated length-delimited field (e.g. trainer_spec) must be skipped
    junk = b"ignored"
    data += _varint((2 << 3) | 2) + _varint(len(junk)) + junk
    return data


ENTRIES = [
    ("<unk>", 0.0, UNKNOWN),
    ("<s>", 0.0, CONTROL),
    ("</s>", 0.0, CONTROL),
    ("▁THE", -1.0, NORMAL),
    ("▁CAT", -2.0, NORMAL),
    ("▁C", -4.0, NORMAL),
    ("AT", -4.5, NORMAL),
    ("A", -6.0, NORMAL),
    ("T", -6.0, NORMAL),
    ("C", -6.0, NORMAL),
    ("H", -6.5, NORMAL),
    ("E", -6.5, NORMAL),
    ("▁", -7.0, NORMAL),
]


@pytest.fixture()
def spm_file(tmp_path):
    path = tmp_path / "tok.model"
    path.write_bytes(_model_bytes(ENTRIES))
    return str(path)


def test_spm_ids_match_model_order(spm_file):
    tok = UnigramTokenizer().load_sentencepiece(spm_file)
    assert tok.vocab_size() == len(ENTRIES)
    # sentencepiece id space verbatim: piece index == id
    assert tok.encode_as_ids("THE CAT") == [3, 4]
    # Viterbi picks the best-scoring segmentation for unseen words
    ids = tok.encode_as_ids("CAT CAT")
    assert ids == [4, 4]


def test_spm_decode_skips_control_ids(spm_file):
    tok = UnigramTokenizer().load_sentencepiece(spm_file)
    assert tok.decode_ids([1, 3, 4, 2]) == "THE CAT"  # <s>/<​s> dropped


def test_spm_control_pieces_never_emitted(spm_file):
    tok = UnigramTokenizer().load_sentencepiece(spm_file)
    # text containing the literal control string still segments to chars
    ids = tok.encode_as_ids("CHAT")
    assert 1 not in ids and 2 not in ids
    assert tok.decode_ids(ids) == "CHAT"


def test_spm_unknown_char_maps_to_unk(spm_file):
    tok = UnigramTokenizer().load_sentencepiece(spm_file)
    ids = tok.encode_as_ids("THE Q")
    assert ids[0] == 3
    assert 0 in ids  # Q is not in the vocab -> unk id 0
