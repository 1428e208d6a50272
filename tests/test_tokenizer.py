"""Tokenizer unit tests + behavioral parity with the reference tokenizer."""

import sys

import numpy as np
import pytest

from vqa_tpu.utils.tokenizer import (
    END_IDX,
    PAD_IDX,
    START_IDX,
    UNK_IDX,
    Tokenizer,
    create_tokenizer_from_questions,
)

QUESTIONS = [
    "What color is the cat?",
    "How many people are there?",
    "Is this a beach?",
    "What is the man doing?",
    "What's in the background?",
    "What color is the dog?",
    "What color is the sky?",
]


def test_preprocess():
    assert Tokenizer.preprocess("What's in the IMAGE?") == "what's in the image"
    assert Tokenizer.preprocess("  A,  b!! c?? ") == "a b c"


def test_build_encode_decode():
    tok = Tokenizer(max_length=10, vocab_size=100)
    tok.build_vocab(QUESTIONS, min_freq=1)
    ids, mask = tok.encode("What color is the dog?")
    assert len(ids) == 10 and len(mask) == 10
    assert ids[0] == START_IDX
    assert mask[: sum(mask)] == [1] * sum(mask)
    assert ids[sum(mask) :] == [PAD_IDX] * (10 - sum(mask))
    assert tok.decode(ids) == "what color is the dog"


def test_truncation_keeps_end_token():
    tok = Tokenizer(max_length=5, vocab_size=100)
    tok.build_vocab(QUESTIONS, min_freq=1)
    ids, mask = tok.encode("what color is the man doing in the background")
    assert len(ids) == 5
    assert ids[-1] == END_IDX
    assert mask == [1] * 5


def test_unk_handling():
    tok = Tokenizer(max_length=8, vocab_size=100)
    tok.build_vocab(QUESTIONS, min_freq=1)
    ids, _ = tok.encode("what zebrafish")
    assert UNK_IDX in ids


def test_min_freq_filter():
    tok = Tokenizer(max_length=8)
    tok.build_vocab(QUESTIONS, min_freq=2)
    assert "color" in tok.word2idx  # appears 3x
    assert "beach" not in tok.word2idx  # appears once


def test_save_load_roundtrip(tmp_path):
    tok = create_tokenizer_from_questions(QUESTIONS, max_length=12,
                                          vocab_size=50, min_freq=1)
    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = Tokenizer()
    tok2.load(p)
    assert tok2.word2idx == tok.word2idx
    assert tok2.max_length == 12
    assert tok2.encode("what color") == tok.encode("what color")


def test_encode_batch_np():
    tok = Tokenizer(max_length=9, vocab_size=100)
    tok.build_vocab(QUESTIONS, min_freq=1)
    ids, mask = tok.encode_batch_np(["what color", "is this a beach"])
    assert ids.shape == (2, 9) and ids.dtype == np.int32
    assert mask.shape == (2, 9) and mask.dtype == np.int32


def test_parity_with_reference_tokenizer():
    """Same questions must produce identical ids/masks as the reference
    implementation (reference: utils/tokenizer.py:46-333)."""
    sys.path.insert(0, "/root/reference")
    try:
        from utils.tokenizer import Tokenizer as RefTokenizer
    except ImportError:
        pytest.skip("reference not importable")
    finally:
        sys.path.remove("/root/reference")

    ref = RefTokenizer(max_length=14, vocab_size=60)
    ref.build_vocab(QUESTIONS, min_freq=1)
    mine = Tokenizer(max_length=14, vocab_size=60)
    mine.build_vocab(QUESTIONS, min_freq=1)
    assert mine.word2idx == ref.word2idx
    for q in QUESTIONS + ["what IS that huge zebra doing???", ""]:
        assert mine.encode(q) == tuple(ref.encode(q)) or mine.encode(q) == ref.encode(q)
