"""Inference engine: checkpoint loading with graceful fallbacks + jitted
bucket-batched forward.

Re-design of the reference engine (reference: api/inference.py:36-358) with
the same degradation chain — missing checkpoint → randomly-initialized
default model; missing tokenizer JSON → tiny built-in vocab; missing answer
vocab → ``answer_i`` placeholders — plus TPU-first mechanics:

- ONE compiled XLA program per batch bucket (1/4/16/32): requests are
  padded up to the nearest bucket so arbitrary batch sizes never trigger
  recompilation;
- the host ships uint8 pixels; /255 + ImageNet normalize run on device,
  fused into the forward program;
- can also load a *reference PyTorch* checkpoint directly through
  vqa_tpu.compat.torch_import — a reference user's .pth just works.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.data.preprocess import (
    ImageInput,
    device_normalize,
    resize_batch_to_uint8,
)
from vqa_tpu.data.vocab import AnswerVocabulary
from vqa_tpu.utils.config import InferenceConfig, ModelConfig
from vqa_tpu.utils.tokenizer import Tokenizer

_DEFAULT_QUESTION_WORDS = [
    "what", "is", "this", "color", "how", "many", "are", "there", "the",
    "a", "in", "on", "of", "man", "woman", "dog", "cat", "doing", "wearing",
]


class VQAInference:
    """Lazy-loading inference engine (reference: api/inference.py:36-193)."""

    def __init__(
        self,
        checkpoint_dir: Optional[str] = None,
        checkpoint_name: str = "best_model",
        config: Optional[InferenceConfig] = None,
        model_config: Optional[ModelConfig] = None,
        dtype=None,
        mesh=None,
    ):
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_name = checkpoint_name
        self.cfg = config or InferenceConfig()
        self._model_config = model_config
        self._dtype = dtype
        # multi-chip serving (SURVEY.md §2.6 DP row; the reference pins one
        # device, api/inference.py:222-225): bucket batches shard over the
        # mesh's 'data' axis, params follow the TP rules (replicated on a
        # pure-DP mesh). Buckets round up to a multiple of the DP degree.
        self.mesh = mesh
        self._dp = 1 if mesh is None else mesh.shape.get("data", 1)
        self._batch_sharding = None
        self.model = None
        self.variables = None
        self.tokenizer: Optional[Tokenizer] = None
        self.answer_vocab: Optional[AnswerVocabulary] = None
        self.model_loaded_from_checkpoint = False
        self._forward = None
        self._attention_fwd = None
        self._compute_dtype = None
        self._lock = threading.Lock()

    # ------------------------------------------------------------------
    def load(self) -> "VQAInference":
        import jax.numpy as jnp

        from vqa_tpu.models import create_vqa_model, init_vqa_model

        dtype = self._dtype
        if dtype is None:
            dtype = (
                jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
            )
        # NOTE: the space-to-depth stem plan (models.cnn_backbone.StemConv)
        # measured ~4% slower than XLA's native stem handling on TPU, so the
        # engine uses the create_vqa_model default (off).

        # ---- model: checkpoint → torch .pth → random default -----------
        loaded = False
        if self.checkpoint_dir:
            from vqa_tpu.training import checkpoint as ckpt_lib

            if ckpt_lib.checkpoint_exists(self.checkpoint_dir, self.checkpoint_name):
                self.model, self.variables = ckpt_lib.load_model_for_inference(
                    self.checkpoint_dir, self.checkpoint_name, dtype=dtype
                )
                loaded = True
                print(f"[Inference] loaded checkpoint {self.checkpoint_name}")
            else:
                pth = os.path.join(self.checkpoint_dir, self.checkpoint_name)
                if os.path.exists(pth) and pth.endswith(".pth"):
                    from vqa_tpu.compat.torch_import import load_torch_checkpoint

                    variables, mcfg = load_torch_checkpoint(pth)
                    self.model = create_vqa_model(config=mcfg, dtype=dtype)
                    self.variables = variables
                    loaded = True
                    print(f"[Inference] imported PyTorch checkpoint {pth}")
        if not loaded:
            # random default model (reference: api/inference.py:96-102)
            print("[Inference] no checkpoint — using randomly initialized model")
            mcfg = self._model_config or ModelConfig()
            self.model = create_vqa_model(config=mcfg, dtype=dtype)
            self.variables = init_vqa_model(self.model, jax.random.PRNGKey(0))
        self.model_loaded_from_checkpoint = loaded

        # ---- tokenizer (reference: api/inference.py:107-119) -----------
        tok_path = (
            os.path.join(self.checkpoint_dir, "tokenizer.json")
            if self.checkpoint_dir
            else None
        )
        self.tokenizer = Tokenizer(
            max_length=self.model.config.max_question_length
        )
        if tok_path and os.path.exists(tok_path):
            self.tokenizer.load(tok_path)
        else:
            self.tokenizer.build_vocab(
                [" ".join(_DEFAULT_QUESTION_WORDS)], min_freq=1
            )

        # ---- answer vocab (reference: api/inference.py:122-132) --------
        vocab_path = (
            os.path.join(self.checkpoint_dir, "answer_vocab.json")
            if self.checkpoint_dir
            else None
        )
        self.answer_vocab = AnswerVocabulary(
            num_answers=self.model.config.num_answers
        )
        if vocab_path and os.path.exists(vocab_path):
            self.answer_vocab.load(vocab_path)
        else:
            self.answer_vocab.answer2idx = {
                f"answer_{i}": i for i in range(self.model.config.num_answers)
            }
            self.answer_vocab.idx2answer = {
                i: f"answer_{i}" for i in range(self.model.config.num_answers)
            }
            self.answer_vocab._is_built = True

        # ---- mesh placement ---------------------------------------------
        if self.mesh is not None:
            from vqa_tpu.parallel.mesh import data_sharding, shard_variables

            self.variables = shard_variables(self.variables, self.mesh)
            self._batch_sharding = data_sharding(self.mesh)

        # ---- compiled forward -------------------------------------------
        model = self.model
        mdtype = dtype

        @jax.jit
        def forward(variables, pixels_u8, token_ids, attention_mask):
            images = device_normalize(pixels_u8).astype(mdtype)
            logits, _ = model.apply(
                variables, images, token_ids, attention_mask, train=False
            )
            return jax.nn.softmax(logits, axis=-1)

        self._forward = forward
        self._compute_dtype = mdtype
        return self

    def _ensure_loaded(self):
        if self._forward is None:
            with self._lock:
                if self._forward is None:
                    self.load()

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Pre-compile every program on the request path for every batch
        bucket so the first real request (and the first burst) never pays an
        XLA compile.

        Runs the FULL ``predict_batch_raw`` path — decode/resize, tokenize,
        the jitted forward, and the device→host fetch — not just the
        forward: any stray eager op compiles its own program, and over the
        TPU tunnel even a tiny one is tens of seconds cold (a first request
        used to hang ~45s after a forward-only warmup)."""
        self._ensure_loaded()
        size = self.model.config.image_size
        img = np.zeros((size, size, 3), np.uint8)
        for b in buckets or self.cfg.batch_buckets:
            self.predict_batch_raw([img] * b, ["warm up question"] * b)
        print(f"[Inference] warmed buckets {tuple(buckets or self.cfg.batch_buckets)}")

    # ------------------------------------------------------------------
    def _effective_buckets(self) -> List[int]:
        """Configured buckets, each rounded up to a multiple of the DP
        degree so sharded batches split evenly over the mesh."""
        dp = self._dp
        out: List[int] = []
        for b in self.cfg.batch_buckets:
            eb = -(-b // dp) * dp
            if eb not in out:
                out.append(eb)
        return out

    def _bucket(self, n: int) -> int:
        """Smallest warmed bucket that fits n. Oversized requests never
        reach here — predict_probs_from_pixels chunks them to the largest
        bucket first, so no request-time cold compile is possible
        (previously n>32 fell through to an unwarmed power of two)."""
        buckets = self._effective_buckets()
        for b in buckets:
            if n <= b:
                return b
        raise AssertionError(
            f"batch {n} exceeds the largest bucket {buckets[-1]}; "
            "caller must chunk (predict_probs_from_pixels does)"
        )

    def _preprocess_images(self, images: Sequence[ImageInput]) -> np.ndarray:
        # decode (PIL) + resize (native C++ thread pool when available;
        # bit-identical to PIL bilinear) → [N, S, S, 3] u8
        return resize_batch_to_uint8(images, self.model.config.image_size)

    def predict_probs_from_pixels(
        self, pixels: np.ndarray, questions: Sequence[str]
    ) -> np.ndarray:
        """Pre-resized uint8 pixels [N,S,S,3] + questions → probabilities
        [N, num_answers] via the bucket-padded jitted forward."""
        self._ensure_loaded()
        n = len(questions)
        if n == 0:  # nothing to do; don't feed rank-deficient arrays to XLA
            return np.zeros((0, self.model.config.num_answers), np.float32)
        max_bucket = self._effective_buckets()[-1]
        if n > max_bucket:
            # chunk host-side into warmed max-size buckets — an oversized
            # request must never trigger a request-time XLA compile (tens
            # of seconds cold; VERDICT r1 item 7). All chunks DISPATCH
            # before any fetch: JAX queues them back-to-back on device, so
            # the host↔device round-trip is paid once, not per chunk.
            dispatched = [
                self.dispatch_probs_from_pixels(
                    pixels[i : i + max_bucket], questions[i : i + max_bucket]
                )
                for i in range(0, n, max_bucket)
            ]
            return np.concatenate(
                [np.asarray(p, np.float32)[:k] for p, k in dispatched]
            )
        probs, n = self.dispatch_probs_from_pixels(pixels, questions)
        # fetch the whole padded bucket and slice on host: probs[:n] on
        # device would compile a separate tiny slice program per distinct n
        return np.asarray(probs, np.float32)[:n]

    def dispatch_probs_from_pixels(self, pixels: np.ndarray, questions):
        """Async dispatch for the serving pipeline: pads to a warmed bucket
        and returns the (padded) DEVICE probability array plus n, WITHOUT
        blocking on the result — the caller overlaps the device round-trip
        with preparing the next group. n must fit the largest bucket."""
        self._ensure_loaded()
        n = len(questions)
        bucket = self._bucket(n)
        ids, mask = self.tokenizer.encode_batch_np(list(questions))
        if bucket > n:
            pad = bucket - n
            pixels = np.concatenate([pixels, np.repeat(pixels[:1], pad, 0)])
            ids = np.concatenate([ids, np.repeat(ids[:1], pad, 0)])
            mask = np.concatenate([mask, np.repeat(mask[:1], pad, 0)])
        if self._batch_sharding is not None:
            pixels, ids, mask = (
                jax.device_put(np.asarray(x), self._batch_sharding)
                for x in (pixels, ids, mask)
            )
        probs = self._forward(
            self.variables,
            jnp.asarray(pixels),
            jnp.asarray(ids),
            jnp.asarray(mask),
        )
        return probs, n

    def predict_batch_raw(
        self,
        images: Sequence[ImageInput],
        questions: Sequence[str],
    ) -> np.ndarray:
        """Batched probabilities [N, num_answers]: decode/resize (native
        C++ path) then the pixels forward. The serving hot path."""
        self._ensure_loaded()
        if len(images) == 0:
            return np.zeros((0, self.model.config.num_answers), np.float32)
        pixels = self._preprocess_images(images)
        return self.predict_probs_from_pixels(pixels, questions)

    def _format_result(
        self, question: str, probs: np.ndarray, top_k: int
    ) -> Dict[str, Any]:
        top_idx = np.argsort(-probs)[:top_k]
        answers = [
            {
                "answer": self.answer_vocab.decode(int(i)),
                "probability": float(probs[i]),
                "index": int(i),
            }
            for i in top_idx
        ]
        return {
            "question": question,
            "answers": answers,
            "top_answer": answers[0]["answer"],
            "confidence": answers[0]["probability"],
        }

    def predict(
        self,
        image: ImageInput,
        question: str,
        top_k: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Single prediction (reference: api/inference.py:195-253)."""
        top_k = top_k or self.cfg.top_k
        probs = self.predict_batch_raw([image], [question])[0]
        return self._format_result(question, probs, top_k)

    def attention_map(
        self,
        image: ImageInput,
        question: str,
        top_k: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Prediction PLUS the question's cross-attention heatmap over the
        image grid — the serving surface for the visualization API the
        reference exposes only in Python (reference:
        models/vqa_model.py:341-369). One jitted program returns
        (softmax probs, layer/head-averaged [L, S, S] spatial maps);
        compiled lazily on first use (a diagnostics path — keeping it out
        of warmup() keeps server startup fast)."""
        self._ensure_loaded()
        if self._attention_fwd is None:
            with self._lock:
                if self._attention_fwd is None:
                    from vqa_tpu.models.fusion import attention_visualization

                    model = self.model
                    mdtype = self._compute_dtype

                    @jax.jit
                    def attention_forward(variables, pixels_u8, ids, mask):
                        images = device_normalize(pixels_u8).astype(mdtype)
                        logits, aux = model.apply(
                            variables, images, ids, mask,
                            train=False, return_aux=True,
                        )
                        spatial = attention_visualization(
                            aux["cross_attention_weights"],
                            model.config.feature_spatial_size,
                        )
                        return (
                            jax.nn.softmax(logits, axis=-1),
                            spatial.astype(jnp.float32),
                        )

                    self._attention_fwd = attention_forward
        # pad to the DP degree and shard like every other forward path —
        # an unsharded batch-of-1 against mesh-sharded params would hand
        # GSPMD a batch dim indivisible by the data axis
        dp = self._dp
        pixels = self._preprocess_images([image] * dp)
        ids, mask = self.tokenizer.encode_batch_np([question] * dp)
        pixels, ids, mask = (
            np.asarray(pixels), np.asarray(ids), np.asarray(mask)
        )
        if self._batch_sharding is not None:
            pixels, ids, mask = (
                jax.device_put(x, self._batch_sharding)
                for x in (pixels, ids, mask)
            )
        probs, spatial = self._attention_fwd(self.variables, pixels, ids, mask)
        probs = np.asarray(probs, np.float32)[0]
        spatial = np.asarray(spatial, np.float32)[0]  # [L, S, S]
        n_tokens = int(np.asarray(mask)[0].sum())
        tokens = [
            self.tokenizer.idx2word.get(int(t), "<UNK>")
            for t in np.asarray(ids)[0][:n_tokens]
        ]
        result = self._format_result(
            question, probs, top_k or self.cfg.top_k
        )
        result["attention"] = {
            "tokens": tokens,
            "spatial_size": int(self.model.config.feature_spatial_size),
            # per-token maps for the question's real tokens only
            "maps": spatial[:n_tokens].tolist(),
        }
        return result

    def predict_batch(
        self,
        images: Sequence[ImageInput],
        questions: Sequence[str],
        top_k: Optional[int] = None,
    ) -> List[Dict[str, Any]]:
        """Batch prediction (reference: api/inference.py:255-323)."""
        top_k = top_k or self.cfg.top_k
        probs = self.predict_batch_raw(images, questions)
        return [
            self._format_result(q, p, top_k) for q, p in zip(questions, probs)
        ]

    def get_model_info(self) -> Dict[str, Any]:
        """(reference: api/inference.py:325-338)"""
        self._ensure_loaded()
        from vqa_tpu.models import count_parameters

        cfg = self.model.config
        return {
            "model_loaded": self.model_loaded_from_checkpoint,
            "embed_dim": cfg.embed_dim,
            "num_answers": cfg.num_answers,
            "vocab_size": cfg.vocab_size,
            "max_question_length": cfg.max_question_length,
            "image_size": cfg.image_size,
            "parameters": count_parameters(self.variables),
            "backend": jax.default_backend(),
        }


_ENGINE: Optional[VQAInference] = None
_ENGINE_LOCK = threading.Lock()


def get_inference_engine(
    checkpoint_dir: Optional[str] = None, **kwargs
) -> VQAInference:
    """Lazy singleton (reference: api/inference.py:341-358)."""
    global _ENGINE
    if _ENGINE is None:
        with _ENGINE_LOCK:
            if _ENGINE is None:
                _ENGINE = VQAInference(checkpoint_dir=checkpoint_dir, **kwargs)
                _ENGINE.load()
    return _ENGINE


def reset_engine() -> None:
    global _ENGINE
    _ENGINE = None
