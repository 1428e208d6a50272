"""vqa_tpu — a TPU-native (JAX/XLA/Flax/Pallas) Visual Question Answering framework.

A from-scratch rebuild of the capabilities of the reference PyTorch VQA system
(`zeyadmohamedabdo/Visual-Question-Answering-VQA-system`), redesigned TPU-first:

- NHWC conv layout, bf16 compute / f32 param dtype policy
- one jitted XLA program per workload (train step, batched inference step)
- mesh-first parallelism (`jax.sharding.Mesh` + NamedSharding), even on 1 chip
- optional Pallas TPU kernels for the fused cross-attention and SE paths
- Orbax checkpointing; JSON tokenizer/vocab artifacts byte-compatible with
  the reference's (utils/tokenizer.py, data/build_vocab.py JSON schemas)

Layer map mirrors SURVEY.md §1: utils → models/ops → data → training → serving.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API: ``from vqa_tpu import VQAModel`` etc. without
    importing jax/flax at package-import time (keeps CLI --help and pure
    host-side users fast on this 1-core machine)."""
    _API = {
        "VQAModel": "vqa_tpu.models",
        "create_vqa_model": "vqa_tpu.models",
        "init_vqa_model": "vqa_tpu.models",
        "predict_topk": "vqa_tpu.models",
        "forward_logits": "vqa_tpu.models",
        "count_parameters": "vqa_tpu.models",
        "Trainer": "vqa_tpu.training.train",
        "Evaluator": "vqa_tpu.training.evaluate",
        "VQAInference": "vqa_tpu.serving.engine",
        "VQAServer": "vqa_tpu.serving.server",
        "MicroBatcher": "vqa_tpu.serving.batcher",
        "Tokenizer": "vqa_tpu.utils.tokenizer",
        "AnswerVocabulary": "vqa_tpu.data.vocab",
        "VQADataset": "vqa_tpu.data.dataset",
        "create_train_val_loaders": "vqa_tpu.data.dataset",
        "create_demo_loaders": "vqa_tpu.data.dataset",
        "create_mesh": "vqa_tpu.parallel.mesh",
        "ModelConfig": "vqa_tpu.utils.config",
        "TrainingConfig": "vqa_tpu.utils.config",
        "InferenceConfig": "vqa_tpu.utils.config",
        "load_torch_checkpoint": "vqa_tpu.compat.torch_import",
    }
    if name in _API:
        import importlib

        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(f"module 'vqa_tpu' has no attribute {name!r}")
