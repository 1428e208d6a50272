from vqa_tpu.serving.batcher import MicroBatcher  # noqa: F401
from vqa_tpu.serving.engine import VQAInference, get_inference_engine  # noqa: F401
from vqa_tpu.serving.server import VQAServer  # noqa: F401
from vqa_tpu.serving import schemas  # noqa: F401
