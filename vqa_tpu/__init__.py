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
