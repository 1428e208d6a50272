"""Configuration for the TPU-native VQA framework.

Mirrors the reference's layered dataclass-config pattern
(reference: utils/config.py:18-287) with TPU-specific additions:
mesh axes, dtype policy, and pallas-kernel toggles.

All architecture hyperparameters default to the reference's values
(reference: utils/config.py:57-134, models/vqa_model.py:132-152) so a
reference user finds identical knobs.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Tuple


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@dataclass
class PathConfig:
    """Filesystem layout (reference: utils/config.py:18-54, but repo-relative
    instead of the reference's hardcoded ``d:/cnn/...`` Windows paths)."""

    data_root: str = os.path.join(_REPO_ROOT, "data_store")
    # VQA v2 layout
    questions_file: str = "questions.json"
    annotations_file: str = "annotations.json"
    images_dir: str = "images"
    # artifacts
    checkpoint_dir: str = os.path.join(_REPO_ROOT, "checkpoints")
    log_dir: str = os.path.join(_REPO_ROOT, "logs")
    tokenizer_file: str = "tokenizer.json"
    answer_vocab_file: str = "answer_vocab.json"

    def __post_init__(self):
        for d in (self.checkpoint_dir, self.log_dir):
            os.makedirs(d, exist_ok=True)

    @property
    def questions_path(self) -> str:
        return os.path.join(self.data_root, self.questions_file)

    @property
    def annotations_path(self) -> str:
        return os.path.join(self.data_root, self.annotations_file)

    @property
    def images_path(self) -> str:
        return os.path.join(self.data_root, self.images_dir)

    @property
    def tokenizer_path(self) -> str:
        return os.path.join(self.checkpoint_dir, self.tokenizer_file)

    @property
    def answer_vocab_path(self) -> str:
        return os.path.join(self.checkpoint_dir, self.answer_vocab_file)


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (reference: utils/config.py:57-134).

    Frozen → hashable, so flax modules carrying it can key jit caches.
    Use ``dataclasses.replace`` to derive variants.
    """

    # image encoder
    image_size: int = 224
    in_channels: int = 3
    base_channels: int = 64
    # None derives the classic (1, 2, 4, 8)·base_channels ramp in
    # __post_init__, so customizing base_channels alone is never silently
    # ignored; set explicitly for non-proportional stage widths
    stage_channels: Tuple[int, int, int, int] = None
    blocks_per_stage: Tuple[int, int, int, int] = (2, 2, 2, 2)
    feature_spatial_size: int = 7  # 224 / 32
    use_se_attention: bool = True
    use_spatial_attention: bool = True
    se_reduction: int = 16
    spatial_kernel_size: int = 7

    # text encoder
    vocab_size: int = 10000
    embed_dim: int = 256
    num_transformer_layers: int = 4
    num_attention_heads: int = 8
    ffn_hidden_dim: int = 1024
    max_question_length: int = 20
    pad_idx: int = 0

    # fusion
    num_cross_layers: int = 2
    use_gating: bool = True

    def __post_init__(self):
        if self.stage_channels is None:
            object.__setattr__(  # frozen dataclass
                self,
                "stage_channels",
                tuple(self.base_channels * m for m in (1, 2, 4, 8)),
            )

    # answer head
    num_answers: int = 1000
    answer_hidden_dim: int = 512  # embed_dim * 2
    answer_dropout: float = 0.3

    dropout: float = 0.1


@dataclass
class TrainingConfig:
    """Training hyperparameters (reference: utils/config.py:137-217)."""

    num_samples: int = 25000
    train_split: float = 0.8
    batch_size: int = 32
    eval_batch_size: int = 64
    seed: int = 42

    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    min_lr: float = 1e-6
    # NOTE: the reference declares warmup_epochs=2 but never implements warmup
    # (reference: utils/config.py:190 vs training/train.py:139-143). We
    # implement it properly; set warmup_epochs=0 to reproduce the reference.
    warmup_epochs: int = 2
    # cosine-decay granularity: "step" decays the LR every optimizer step
    # (smooth cosine, the TPU-native default); "epoch" holds the LR constant
    # within each epoch and steps the cosine once per epoch — the reference's
    # exact CosineAnnealingLR semantics (reference: training/train.py:139-143,
    # scheduler.step() at :352). "epoch" exists for controlled head-to-head
    # parity runs; mid-training the step schedule sits up to half an epoch
    # further down the cosine, which measurably slows the train-loss descent
    # (docs/HEAD_TO_HEAD.md).
    lr_schedule_granularity: str = "step"

    num_epochs: int = 30
    # uniform label smoothing on the 1000-way CE loss (0 = the reference's
    # plain CE, training/train.py:120). TPU-native addition; standard
    # regularizer for large-answer-vocabulary classification.
    label_smoothing: float = 0.0
    # microbatches per optimizer step (lax.scan over the split batch inside
    # ONE jitted program). 1 = the reference's plain step. Gradients are
    # averaged across microbatches; BN normalizes per microbatch and chains
    # its EMA update through the scan. TPU-native addition (no reference
    # equivalent — the reference has no accumulation).
    grad_accum: int = 1
    # activation rematerialization in the backward ("none" | "full" |
    # "stages"): a jax.checkpoint memory lever for activation-bound configs
    # — "stages" keeps only CNN stage-boundary activations and recomputes
    # the interiors. TPU-native addition; speed measured in docs/PERF.md.
    remat: str = "none"
    grad_clip_norm: float = 1.0
    early_stop_patience: int = 10
    checkpoint_every: int = 5
    log_interval: int = 50

    # dtype policy: bf16 compute replaces the reference's CUDA AMP
    # (reference: training/train.py:146,179-195); no loss scaler is needed
    # for bf16 on TPU.
    use_bf16: bool = True


@dataclass
class InferenceConfig:
    """Inference/serving settings (reference: utils/config.py:220-235)."""

    top_k: int = 5
    confidence_threshold: float = 0.1
    host: str = "0.0.0.0"
    port: int = 8000
    # serving micro-batcher (new vs reference: the reference runs one forward
    # per request with no cross-request batching, api/inference.py:255-323)
    max_batch_size: int = 32
    batch_timeout_ms: float = 5.0
    batch_buckets: Tuple[int, ...] = (1, 4, 16, 32)
    # hard cap on images per /predict-batch request (413-style guard);
    # within it, oversized batches are chunked into warmed buckets
    max_request_batch: int = 128
    # reject request bodies above this size with 413 before reading them —
    # an unbounded read would buffer an arbitrarily large upload in memory
    # (the frontend enforces 10 MB per image client-side; this is the
    # server-side backstop sized for a max_request_batch of images)
    max_body_mb: int = 256


@dataclass
class MeshConfig:
    """Device-mesh / parallelism settings — TPU-native addition.

    The reference has no parallelism at all (SURVEY.md §2.6); here every
    program is built over a `jax.sharding.Mesh` so multi-chip DP/TP is a
    config change, not a code change.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 = use all available devices on the data axis
    data_parallel: int = -1
    model_parallel: int = 1


@dataclass
class KernelConfig:
    """Pallas kernel toggles. XLA fallbacks always exist.

    ``use_pallas_cross_attention`` is the default consumed by
    ``create_vqa_model`` (override per call or via ``bench.py --pallas``).
    Measured on the target chip the fused kernel loses to XLA fusion at
    these attention shapes (see ops/cross_attention_kernel.py), so it
    defaults off. The fused SE kernel (ops/se_kernel.py) is a library op
    validated on hardware but intentionally not wired into the model: its
    epilogue is already fully fused by XLA, and threading a kernel flag
    through the checkpointed module tree would change the param structure.
    """

    use_pallas_cross_attention: bool = False
    # Fused Pallas stem (ops/stem_kernel.py): inference-only execution plan
    # (conv+BN-affine+ReLU+maxpool in one VMEM pass); identical variable
    # tree either way. Defaults off pending the on-chip measurement
    # (bench.py --fused-stem; record in docs/PERF.md).
    use_fused_stem: bool = False


PATHS = PathConfig()
MODEL = ModelConfig()
TRAINING = TrainingConfig()
INFERENCE = InferenceConfig()
MESH = MeshConfig()
KERNELS = KernelConfig()


def tiny_model_config() -> ModelConfig:
    """The shared `--tiny` model (smoke/demo runs): one source of truth for
    the train CLI, the serving CLI, and the load benchmark."""
    return ModelConfig(
        vocab_size=1000, embed_dim=32, num_answers=16,
        num_transformer_layers=1, num_attention_heads=2,
        ffn_hidden_dim=64, max_question_length=8, image_size=64,
        base_channels=8, stage_channels=(8, 16, 32, 64),
        feature_spatial_size=2,
    )


def model_config_dict(cfg: ModelConfig) -> dict:
    """Serialize a ModelConfig for checkpoint round-trips
    (reference keeps a config dict inside checkpoints, models/vqa_model.py:226-241)."""
    d = dataclasses.asdict(cfg)
    d["stage_channels"] = list(d["stage_channels"])
    d["blocks_per_stage"] = list(d["blocks_per_stage"])
    return d


def model_config_from_dict(d: dict) -> ModelConfig:
    known = {f.name for f in dataclasses.fields(ModelConfig)}
    kwargs = {k: v for k, v in d.items() if k in known}
    for k in ("stage_channels", "blocks_per_stage"):
        if k in kwargs:
            kwargs[k] = tuple(kwargs[k])
    return ModelConfig(**kwargs)


def print_config() -> None:
    """Pretty-print all config singletons (reference: utils/config.py:262-287)."""
    for name, cfg in (
        ("Paths", PATHS),
        ("Model", MODEL),
        ("Training", TRAINING),
        ("Inference", INFERENCE),
        ("Mesh", MESH),
        ("Kernels", KERNELS),
    ):
        print(f"[Config] {name}:")
        for f in dataclasses.fields(cfg):
            print(f"    {f.name} = {getattr(cfg, f.name)}")
