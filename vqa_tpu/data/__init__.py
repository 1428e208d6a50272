from vqa_tpu.data.vocab import AnswerVocabulary, create_answer_vocabulary  # noqa: F401
