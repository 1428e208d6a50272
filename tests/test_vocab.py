"""Answer vocabulary tests + behavioral parity with the reference."""

import json
import sys

import pytest

from vqa_tpu.data.vocab import AnswerVocabulary

QA = [
    {"answer": "yes"},
    {"answer": "no"},
    {"answer": "Yes"},
    {"answer": "blue"},
    {"answer": "red"},
    {"answer": "2"},
    {"answer": "two"},
    {"answer": "yes"},
    {"answer": "yes"},
    {"answer": "no"},
]


def test_preprocess_answer():
    assert AnswerVocabulary.preprocess_answer("The Blue car") == "blue car"
    assert AnswerVocabulary.preprocess_answer("A dog!") == "dog"
    assert AnswerVocabulary.preprocess_answer("  an   apple ") == "apple"


def test_build_topk_and_encode():
    vocab = AnswerVocabulary(num_answers=3)
    vocab.build_from_qa_pairs(QA)
    assert vocab.encode("yes") == 0  # most frequent
    assert vocab.encode("YES") == 0
    assert vocab.encode("unknown answer") == -1
    assert vocab.decode(0) == "yes"
    assert vocab.decode(999) == "<UNKNOWN>"


def test_build_from_annotations(tmp_path):
    anns = {
        "annotations": [
            {
                "question_id": 1,
                "image_id": 1,
                "multiple_choice_answer": "yes",
                "answers": [{"answer": "yes"}] * 7 + [{"answer": "no"}] * 3,
            },
            {
                "question_id": 2,
                "image_id": 2,
                "multiple_choice_answer": "blue",
                "answers": [{"answer": "blue"}] * 10,
            },
        ]
    }
    p = tmp_path / "anns.json"
    p.write_text(json.dumps(anns))
    vocab = AnswerVocabulary(num_answers=10)
    vocab.build_from_annotations(str(p))
    # blue: 11 counts; yes: 8; no: 3
    assert vocab.encode("blue") == 0
    assert vocab.encode("yes") == 1
    assert vocab.encode("no") == 2


def test_save_load_roundtrip(tmp_path):
    vocab = AnswerVocabulary(num_answers=5)
    vocab.build_from_qa_pairs(QA)
    p = str(tmp_path / "vocab.json")
    vocab.save(p)
    v2 = AnswerVocabulary()
    v2.load(p)
    assert v2.answer2idx == vocab.answer2idx
    assert v2.num_answers == 5
    assert len(v2.get_answer_weights()) == 5


def test_parity_with_reference_vocab():
    sys.path.insert(0, "/root/reference")
    try:
        from data.build_vocab import AnswerVocabulary as RefVocab
    except ImportError:
        pytest.skip("reference not importable")
    finally:
        sys.path.remove("/root/reference")

    ref = RefVocab(num_answers=4)
    ref.build_from_qa_pairs(QA)
    mine = AnswerVocabulary(num_answers=4)
    mine.build_from_qa_pairs(QA)
    assert mine.answer2idx == ref.answer2idx
    for a in ["yes", "The Yes", "blue", "nope"]:
        assert mine.encode(a) == ref.encode(a)
