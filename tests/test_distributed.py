"""Multi-host runtime tests (SURVEY.md §2.6 "communication backend" row).

A real 2-process CPU cluster is spawned: both processes call
``jax.distributed.initialize`` (one via explicit args, one via the standard
env vars), build a mesh spanning both processes' devices, feed per-process
local batches through ``data.pipeline.prefetch_to_device``
(``jax.make_array_from_process_local_data``), and run a jitted reduction
whose result depends on BOTH processes' data — proving cross-process
collectives execute.
"""

import os
import socket
import subprocess
import sys

import pytest

from vqa_tpu.parallel import distributed

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os
import sys

mode, port, pid, ckpt_dir = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)

from vqa_tpu.parallel import distributed

if mode == "env":
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    ok = distributed.initialize()
else:
    ok = distributed.initialize(f"localhost:{port}", 2, pid)

assert ok, "expected a multi-process runtime"
assert distributed.process_count() == 2
assert distributed.process_index() == pid
assert distributed.is_primary() == (pid == 0)
assert len(jax.devices()) == 2
assert distributed.local_batch_size(8) == 4

import numpy as np

from vqa_tpu.data.pipeline import prefetch_to_device
from vqa_tpu.parallel.mesh import create_mesh, data_sharding

mesh = create_mesh(data_parallel=2)
# each process feeds only its local half of the global batch
batches = [{"x": np.full((2, 4), pid, np.float32), "valid": 2}]
(b,) = prefetch_to_device(iter(batches), sharding=data_sharding(mesh))
assert b["x"].shape == (4, 4), b["x"].shape  # global shape assembled
s = float(jax.jit(lambda a: a.sum())(b["x"]))  # needs both shards
assert s == 8.0, s

# ---- real multi-host train + validate on a tiny model ----------------
from vqa_tpu.data.dataset import create_demo_loaders, shard_for_process
from vqa_tpu.models import create_vqa_model, init_vqa_model
from vqa_tpu.parallel.mesh import shard_variables
from vqa_tpu.training.train import (
    TrainState, make_optimizer, make_train_step, make_val_step,
)
from vqa_tpu.utils.config import TrainingConfig

train_loader, val_loader = create_demo_loaders(
    batch_size=2, eval_batch_size=2, num_samples=16,
    image_size=32, max_question_length=6, vocab_size=50, num_answers=8,
)
train_loader = shard_for_process(train_loader)
val_loader = shard_for_process(val_loader)
# disjoint, equal-length per-host shards
assert len(train_loader.indices) == 6  # 12 train // 2 hosts
assert len(val_loader.indices) == 2

model = create_vqa_model(
    vocab_size=50, num_answers=8, embed_dim=16, num_transformer_layers=1,
    num_attention_heads=2, ffn_hidden_dim=32, max_question_length=6,
    image_size=32, base_channels=8, stage_channels=(8, 16, 32, 64),
    feature_spatial_size=1,
)
variables = shard_variables(init_vqa_model(model, jax.random.PRNGKey(0)), mesh)
tx, _ = make_optimizer(TrainingConfig(warmup_epochs=0), 10)
state = TrainState.create(
    apply_fn=model.apply, params=variables["params"], tx=tx,
    batch_stats=variables["batch_stats"],
)
train_step = make_train_step(model)
sh = data_sharding(mesh)
n_steps = 0
for batch in prefetch_to_device(train_loader, sharding=sh):
    assert batch["image"].shape[0] == 4  # global batch = 2 hosts x 2 local
    state, m = train_step(
        state, batch["image"], batch["token_ids"],
        batch["attention_mask"], batch["answer"], jax.random.PRNGKey(1),
    )
    n_steps += 1
assert n_steps == 3
loss = float(m["loss"])  # replicated scalar readable on every host
assert np.isfinite(loss)

val_step = make_val_step(model)
tot_n = tot_loss = 0.0
for batch in prefetch_to_device(val_loader, sharding=sh):
    out = val_step(
        state.params, state.batch_stats, batch["image"],
        batch["token_ids"], batch["attention_mask"], batch["answer"],
        batch["valid_mask"],
    )
    tot_n += float(out["n"])
    tot_loss += float(out["loss_sum"])
assert tot_n == 4.0, tot_n  # both hosts' val shards counted exactly once
assert np.isfinite(tot_loss)

# ---- the ACTUAL train CLI, multi-host: loaders shard per process, the
# trainer runs on the global mesh, and the checkpoint save coordinates
# across processes (Orbax all-process write, primary-only sidecar + swap)
from vqa_tpu.training import checkpoint as ckpt_lib
from vqa_tpu.training import train as train_mod

train_mod.main([
    "--demo", "--tiny", "--epochs", "1", "--batch-size", "8",
    "--subset-size", "16", "--checkpoint-dir", ckpt_dir,
])
assert ckpt_lib.checkpoint_exists(ckpt_dir, "latest")
meta = ckpt_lib.load_checkpoint_meta(ckpt_dir, "latest")
assert meta["epoch"] == 0
if pid == 0:  # history is a primary-host-only artifact
    assert os.path.exists(os.path.join(ckpt_dir, "training_history.json"))

print(f"OK process={pid} sum={s} train_loss={loss:.3f} val_n={tot_n}",
      flush=True)
'''


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    # process 0 initializes via explicit args, process 1 via env vars —
    # both join the same cluster, covering both configuration paths
    ckpt_dir = str(tmp_path / "ckpt")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), mode, str(port), str(pid),
             ckpt_dir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid, mode in ((0, "args"), (1, "env"))
    ]
    # Generous margin: the two workers share this host's single CPU core
    # and take ~5 min alone; concurrent load (another suite, a bench run)
    # must not flake the test.
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK process=" in out


def test_single_process_is_noop(monkeypatch):
    """With no coordinator configured, initialize() is a no-op and the
    helpers collapse to the single-process answers."""
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(distributed, "_initialized", False)
    assert distributed.initialize() is False
    assert distributed.process_count() == 1
    assert distributed.is_primary()
    assert distributed.local_batch_size(32) == 32


def test_local_batch_size_divisibility():
    with pytest.raises(ValueError, match="not divisible"):
        # simulate a 3-process view
        import unittest.mock as mock

        with mock.patch.object(distributed.jax, "process_count",
                               return_value=3):
            distributed.local_batch_size(32)


def test_explicit_args_take_precedence_over_env(monkeypatch):
    """When both explicit args and env vars are present, explicit wins
    (the env path only fills in missing values)."""
    captured = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None, local_device_ids=None):
        captured.update(coordinator=coordinator_address,
                        n=num_processes, pid=process_id)

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "envhost:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    monkeypatch.setattr(distributed, "_initialized", False)
    monkeypatch.setattr(distributed.jax.distributed, "initialize", fake_init)
    distributed.initialize("realhost:2", 2, 1)
    assert captured == {"coordinator": "realhost:2", "n": 2, "pid": 1}
