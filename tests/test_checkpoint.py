"""Crash-safety tests for checkpointing (VERDICT r1 item 4): a failure at
any point during a save must leave the previous checkpoint loadable."""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp
import pytest

from vqa_tpu.training import checkpoint as ckpt_lib
from vqa_tpu.utils.config import ModelConfig

CFG = ModelConfig(vocab_size=64, num_answers=16)


def _tree(value: float):
    return {"params": {"w": np.full((4,), value, np.float32)}}


def _save(tmp_path, value, epoch):
    ckpt_lib.save_checkpoint(
        str(tmp_path), "latest", _tree(value), CFG, {"epoch": epoch}
    )


def _load_epoch_and_value(tmp_path):
    tree, _, meta = ckpt_lib.load_checkpoint(str(tmp_path), "latest")
    return meta["epoch"], float(np.asarray(tree["params"]["w"])[0])


def test_save_load_roundtrip(tmp_path):
    _save(tmp_path, 1.0, 0)
    assert ckpt_lib.checkpoint_exists(str(tmp_path), "latest")
    epoch, v = _load_epoch_and_value(tmp_path)
    assert (epoch, v) == (0, 1.0)
    _save(tmp_path, 2.0, 1)  # overwrite path
    epoch, v = _load_epoch_and_value(tmp_path)
    assert (epoch, v) == (1, 2.0)


def test_crash_during_orbax_write_keeps_previous(tmp_path, monkeypatch):
    """Simulated crash in the middle of the (slow) Orbax write: the previous
    'latest' must remain fully readable."""
    _save(tmp_path, 1.0, 0)

    real_save = ocp.StandardCheckpointer.save

    def exploding_save(self, path, tree):
        real_save(self, path, tree)  # partial artifacts exist on disk
        raise RuntimeError("simulated crash mid-save")

    monkeypatch.setattr(ocp.StandardCheckpointer, "save", exploding_save)
    with pytest.raises(RuntimeError, match="simulated crash"):
        _save(tmp_path, 2.0, 1)
    monkeypatch.undo()

    assert ckpt_lib.checkpoint_exists(str(tmp_path), "latest")
    epoch, v = _load_epoch_and_value(tmp_path)
    assert (epoch, v) == (0, 1.0)
    # and the tmp dir did not leak
    assert not os.path.exists(os.path.join(str(tmp_path), "latest.tmp"))


def test_crash_between_swap_renames_recovers(tmp_path, monkeypatch):
    """Worst case: crash after the old checkpoint was renamed away but
    before the new one landed — load_checkpoint recovers from '.old'."""
    _save(tmp_path, 1.0, 0)
    path = os.path.join(str(tmp_path), "latest")
    # simulate the window: latest moved to latest.old, nothing in its place
    os.rename(path, path + ".old")
    os.rename(path + ".meta.json", path + ".old.meta.json")
    assert not os.path.exists(path)

    assert ckpt_lib.checkpoint_exists(str(tmp_path), "latest")
    epoch, v = _load_epoch_and_value(tmp_path)
    assert (epoch, v) == (0, 1.0)


def test_crash_during_best_copy_keeps_previous_best(tmp_path, monkeypatch):
    _save(tmp_path, 1.0, 0)
    ckpt_lib.save_best_copy(str(tmp_path))
    _save(tmp_path, 2.0, 1)

    def exploding_copy(src, dst, **kw):
        raise RuntimeError("simulated crash mid-copy")

    import shutil

    monkeypatch.setattr(shutil, "copytree", exploding_copy)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ckpt_lib.save_best_copy(str(tmp_path))
    monkeypatch.undo()

    tree, _, meta = ckpt_lib.load_checkpoint(str(tmp_path), "best_model")
    assert meta["epoch"] == 0
    assert float(np.asarray(tree["params"]["w"])[0]) == 1.0


def test_crash_between_forward_renames_completes_swap(tmp_path):
    """Crash after the new tree landed but before its sidecar rename: the
    fully written NEW checkpoint is completed from the tmp sidecar."""
    _save(tmp_path, 1.0, 0)
    _save(tmp_path, 2.0, 1)
    path = os.path.join(str(tmp_path), "latest")
    # simulate: new tree in place, sidecar still at .tmp.meta.json,
    # previous checkpoint parked at .old
    os.rename(path + ".meta.json", path + ".tmp.meta.json")
    assert not os.path.exists(path + ".meta.json")

    assert ckpt_lib.checkpoint_exists(str(tmp_path), "latest")
    epoch, v = _load_epoch_and_value(tmp_path)
    assert (epoch, v) == (1, 2.0)


def test_load_model_for_inference_dtype(tmp_path):
    """dtype threads through to the rebuilt model (evaluate --bf16);
    default stays f32 like the reference evaluator."""
    import jax.numpy as jnp

    from vqa_tpu.models import create_vqa_model, init_vqa_model
    from vqa_tpu.utils.config import tiny_model_config

    cfg = tiny_model_config()
    model = create_vqa_model(config=cfg)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    ckpt_lib.save_checkpoint(
        str(tmp_path), "best_model",
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        cfg, {"epoch": 0},
    )
    m32, _ = ckpt_lib.load_model_for_inference(str(tmp_path))
    assert m32.dtype == jnp.float32
    mbf, v = ckpt_lib.load_model_for_inference(
        str(tmp_path), dtype=jnp.bfloat16
    )
    assert mbf.dtype == jnp.bfloat16
    # params are restored in f32 regardless (policy: f32 params)
    leaf = jax.tree_util.tree_leaves(v["params"])[0]
    assert np.asarray(leaf).dtype == np.float32
