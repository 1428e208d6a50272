from vqa_tpu.utils import config, metrics, tokenizer  # noqa: F401
from vqa_tpu.utils.tokenizer import Tokenizer, create_tokenizer_from_questions  # noqa: F401
