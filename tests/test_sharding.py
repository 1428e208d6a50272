"""Multi-chip parallelism tests on the 8-device virtual CPU mesh
(SURVEY.md §4 item (e)): DP batch sharding, TP param sharding, and a full
dp+tp train step compiling and executing with collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vqa_tpu.data.pipeline import prefetch_to_device
from vqa_tpu.models import create_vqa_model, init_vqa_model
from vqa_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    param_spec,
    shard_variables,
    variables_shardings,
)

TINY = dict(
    vocab_size=64,
    num_answers=16,
    embed_dim=16,
    num_transformer_layers=1,
    num_attention_heads=2,
    ffn_hidden_dim=32,
    max_question_length=6,
    image_size=32,
    base_channels=8,
    stage_channels=(8, 16, 32, 64),
    feature_spatial_size=1,
)


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_create_mesh_shapes():
    m = create_mesh()  # all data
    assert m.shape == {"data": 8, "model": 1}
    m2 = create_mesh(data_parallel=4, model_parallel=2)
    assert m2.shape == {"data": 4, "model": 2}


def test_mesh_from_config():
    """MeshConfig → Mesh: explicit degrees honored, auto DP clamps to the
    batch divisor (the Trainer default path)."""
    from vqa_tpu.parallel.mesh import mesh_from_config
    from vqa_tpu.utils.config import MeshConfig

    m = mesh_from_config(MeshConfig(data_parallel=4, model_parallel=2))
    assert m.shape == {"data": 4, "model": 2}
    m = mesh_from_config(MeshConfig())  # auto: all devices on data
    assert m.shape == {"data": 8, "model": 1}
    m = mesh_from_config(MeshConfig(), batch_divisor=4)
    assert m.shape == {"data": 4, "model": 1}
    m = mesh_from_config(MeshConfig(model_parallel=2), batch_divisor=6)
    assert m.shape == {"data": 2, "model": 2}
    with pytest.raises(ValueError):
        mesh_from_config(MeshConfig(model_parallel=3))


def test_cli_flags_drive_dp_tp(monkeypatch, tmp_path):
    """--data-parallel/--model-parallel on the train CLI produce a dp×tp
    Trainer mesh and a full (tiny) training run executes on it — multi-chip
    really is a flag change (VERDICT r1 item 1)."""
    from vqa_tpu.training import train as train_mod
    from vqa_tpu.utils.config import MESH

    # restore the MESH singleton fields mutated by main()
    monkeypatch.setattr(MESH, "data_parallel", MESH.data_parallel)
    monkeypatch.setattr(MESH, "model_parallel", MESH.model_parallel)

    captured = {}
    orig_init = train_mod.Trainer.__init__

    def spy(self, *a, **kw):
        orig_init(self, *a, **kw)
        captured["mesh"] = self.mesh

    monkeypatch.setattr(train_mod.Trainer, "__init__", spy)
    logger = train_mod.main([
        "--tiny", "--demo", "--epochs", "1", "--batch-size", "8",
        "--subset-size", "16", "--data-parallel", "4",
        "--model-parallel", "2", "--no-save",
        "--checkpoint-dir", str(tmp_path),
    ])
    assert captured["mesh"].shape == {"data": 4, "model": 2}
    assert np.isfinite(logger.history["train_loss"][0])


def test_param_spec_rules():
    assert param_spec("params/text_encoder/layer0/self_attention/W_q/kernel") == P(None, "model")
    assert param_spec("params/text_encoder/layer0/self_attention/W_o/kernel") == P("model", None)
    assert param_spec("params/text_encoder/layer0/ffn/fc1/kernel") == P(None, "model")
    assert param_spec("params/answer_head/fc2/kernel") == P("model", None)
    assert param_spec("params/image_encoder/stem_conv/kernel") == P()
    assert param_spec("params/text_encoder/token_embedding/embedding") == P("model", None)


def test_dp_forward_matches_single_device():
    """Same logits whether the batch is sharded over 8 devices or not."""
    mesh = create_mesh(data_parallel=8)
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    images = rng.normal(size=(16, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(4, 64, size=(16, 6)).astype(np.int32)
    mask = np.ones((16, 6), np.int32)

    @jax.jit
    def fwd(v, im, i, m):
        return model.apply(v, im, i, m, train=False)[0]

    base = fwd(variables, images, ids, mask)

    v_sh = shard_variables(variables, mesh)
    im_sh = jax.device_put(jnp.asarray(images), data_sharding(mesh))
    ids_sh = jax.device_put(jnp.asarray(ids), data_sharding(mesh))
    mask_sh = jax.device_put(jnp.asarray(mask), data_sharding(mesh))
    out = fwd(v_sh, im_sh, ids_sh, mask_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=2e-4, rtol=2e-4)


def test_tp_param_sharding_applies():
    mesh = create_mesh(data_parallel=4, model_parallel=2)
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    sh = variables_shardings(variables, mesh)
    wq = sh["params"]["text_encoder"]["layer0"]["self_attention"]["W_q"]["kernel"]
    assert wq.spec == P(None, "model")
    v_sh = shard_variables(variables, mesh)
    arr = v_sh["params"]["text_encoder"]["layer0"]["self_attention"]["W_q"]["kernel"]
    # actually distributed: each shard holds half the columns
    assert arr.sharding.spec == P(None, "model")


def test_dp_tp_train_step_executes():
    """Full train step over a (4 data × 2 model) mesh — XLA inserts the
    gradient psum over 'data' and the TP collectives over 'model'."""
    from vqa_tpu.training.train import TrainState, make_optimizer, make_train_step
    from vqa_tpu.utils.config import TrainingConfig

    mesh = create_mesh(data_parallel=4, model_parallel=2)
    model = create_vqa_model(**TINY)
    variables = shard_variables(
        init_vqa_model(model, jax.random.PRNGKey(0)), mesh
    )
    tx, _ = make_optimizer(TrainingConfig(warmup_epochs=0), 10)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables["batch_stats"],
    )
    train_step = make_train_step(model)

    rng = np.random.default_rng(0)
    bs = data_sharding(mesh)
    images = jax.device_put(
        jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32), bs)
    ids = jax.device_put(
        jnp.asarray(rng.integers(4, 64, size=(8, 6)), jnp.int32), bs)
    mask = jax.device_put(jnp.ones((8, 6), jnp.int32), bs)
    labels = jax.device_put(
        jnp.asarray(rng.integers(0, 16, size=(8,)), jnp.int32), bs)

    state2, m = train_step(state, images, ids, mask, labels,
                           jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    # params remain TP-sharded after the update
    wq = state2.params["text_encoder"]["layer0"]["self_attention"]["W_q"]["kernel"]
    assert wq.sharding.spec == P(None, "model")
    # second step (donated buffers path)
    state3, m2 = train_step(state2, images, ids, mask, labels,
                            jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))


def test_bn_under_dp_matches_single_device():
    """BatchNorm semantics under data parallelism are GLOBAL-batch
    (SURVEY.md §7 'decide and document'): one dp8 train step on a fixed
    global batch produces the same loss AND the same updated batch_stats
    as the identical step on one device. The train step is a single jitted
    GSPMD program, so the BN mean/var are computed over the full global
    batch — XLA inserts the cross-replica reductions; there is no
    per-device-stats divergence like torch's non-Sync BatchNorm under DDP
    (the reference is single-device so the question never arises there)."""
    from vqa_tpu.training.train import TrainState, make_optimizer, make_train_step
    from vqa_tpu.utils.config import TrainingConfig

    model = create_vqa_model(**TINY)
    tx, _ = make_optimizer(TrainingConfig(warmup_epochs=0), 10)

    def one_step(mesh):
        # fresh init per run: the train step donates the state buffers
        variables = init_vqa_model(model, jax.random.PRNGKey(0))
        vs = shard_variables(variables, mesh) if mesh else variables
        state = TrainState.create(
            apply_fn=model.apply, params=vs["params"], tx=tx,
            batch_stats=vs["batch_stats"],
        )
        rng = np.random.default_rng(7)
        images = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(4, 64, size=(16, 6)), jnp.int32)
        mask = jnp.ones((16, 6), jnp.int32)
        labels = jnp.asarray(rng.integers(0, 16, size=(16,)), jnp.int32)
        if mesh:
            bs = data_sharding(mesh)
            images, ids, mask, labels = (
                jax.device_put(x, bs) for x in (images, ids, mask, labels)
            )
        # dropout disabled is not needed: same fold_in(rng, step) on the
        # same global program → identical dropout mask either way
        state2, m = make_train_step(model)(
            state, images, ids, mask, labels, jax.random.PRNGKey(3)
        )
        return float(m["loss"]), state2.batch_stats

    loss_1dev, stats_1dev = one_step(None)
    loss_dp8, stats_dp8 = one_step(create_mesh(data_parallel=8))
    assert abs(loss_1dev - loss_dp8) < 2e-5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        stats_1dev,
        stats_dp8,
    )


def test_evaluator_dp8_matches_single_device():
    """Evaluator given a dp8 mesh produces identical metrics to the
    single-device Evaluator on the same data (multi-chip eval)."""
    from vqa_tpu.data.dataset import BatchLoader, DemoVQADataset
    from vqa_tpu.training.evaluate import Evaluator

    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    ds = DemoVQADataset(num_samples=20, image_size=32,
                        max_question_length=6, vocab_size=64, num_answers=16)
    loader = BatchLoader(ds, 8, drop_last=False)

    base = Evaluator(model, variables, None).evaluate(loader)
    sharded = Evaluator(
        model, variables, None, mesh=create_mesh(data_parallel=8)
    ).evaluate(loader)
    assert sharded["num_samples"] == base["num_samples"] == 20
    assert abs(sharded["loss"] - base["loss"]) < 1e-4
    assert sharded["top1_accuracy"] == base["top1_accuracy"]
    assert sharded["top5_accuracy"] == base["top5_accuracy"]


def test_prefetch_with_sharding():
    mesh = create_mesh(data_parallel=8)
    batches = [
        {"image": np.ones((8, 4, 4, 3), np.float32), "valid": 8}
        for _ in range(3)
    ]
    out = list(prefetch_to_device(iter(batches), sharding=data_sharding(mesh)))
    assert len(out) == 3
    assert out[0]["image"].sharding.spec == P("data")
    assert out[0]["valid"] == 8


def test_sharded_checkpoint_save_resume(tmp_path):
    """Checkpoints written from dp×tp-sharded state restore correctly into
    a fresh sharded trainer (multi-chip save/resume round-trip)."""
    from vqa_tpu.data.dataset import create_demo_loaders
    from vqa_tpu.training.train import Trainer
    from vqa_tpu.utils.config import TrainingConfig

    mesh = create_mesh(data_parallel=4, model_parallel=2)
    train_loader, val_loader = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=16,
        image_size=32, max_question_length=6, vocab_size=64, num_answers=16,
    )
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    cfg = TrainingConfig(num_epochs=1, batch_size=4, warmup_epochs=0)
    trainer = Trainer(
        model, variables, train_loader, val_loader, config=cfg,
        mesh=mesh, checkpoint_dir=str(tmp_path),
    )
    trainer.train()

    trainer2 = Trainer(
        model, init_vqa_model(model, jax.random.PRNGKey(9)),
        train_loader, val_loader, config=cfg, mesh=mesh,
        checkpoint_dir=str(tmp_path),
    )
    trainer2.resume("latest")
    assert trainer2.start_epoch == 1
    wq = "params/text_encoder/layer0/self_attention/W_q/kernel".split("/")[1:]
    p1 = trainer.state.params
    p2 = trainer2.state.params
    for k in wq:
        p1, p2 = p1[k], p2[k]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-7)
    # restored params keep working under the sharded eval step
    metrics = trainer2.validate()
    assert np.isfinite(metrics["val_loss"])


def test_mesh_from_config_rejects_non_divisible_explicit_dp():
    """Explicit data_parallel that can't divide the batch fails fast with a
    named reason instead of an opaque XLA device_put error."""
    from vqa_tpu.parallel.mesh import mesh_from_config
    from vqa_tpu.utils.config import MeshConfig

    with pytest.raises(ValueError, match="does not divide the batch"):
        mesh_from_config(MeshConfig(data_parallel=8), batch_divisor=100)
    # divisible explicit dp is fine
    m = mesh_from_config(MeshConfig(data_parallel=4), batch_divisor=100)
    assert m.shape["data"] == 4


def test_grad_accum_step_executes_on_dp_tp_mesh():
    """grad_accum's lax.scan composes with dp×tp sharding: each microbatch
    keeps its batch dim sharded over 'data', params stay TP-sharded, and
    the scanned step matches the plain step's loss on a duplicated batch
    (dropout off; BN normalizes per microbatch)."""
    from vqa_tpu.training.train import TrainState, make_optimizer, make_train_step
    from vqa_tpu.utils.config import TrainingConfig

    mesh = create_mesh(data_parallel=4, model_parallel=2)
    model = create_vqa_model(**TINY, dropout=0.0, answer_dropout=0.0)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))
    tx, _ = make_optimizer(TrainingConfig(warmup_epochs=0), 10)

    def fresh_state():
        v = shard_variables(
            jax.tree_util.tree_map(jnp.copy, variables), mesh
        )
        return TrainState.create(
            apply_fn=model.apply, params=v["params"], tx=tx,
            batch_stats=v["batch_stats"],
        )

    rng = np.random.default_rng(5)
    bs = data_sharding(mesh)
    images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(4, 64, size=(8, 6)).astype(np.int32)
    mask = np.ones((8, 6), np.int32)
    labels = rng.integers(0, 16, size=(8,)).astype(np.int32)

    def put(x):
        return jax.device_put(jnp.asarray(x), bs)

    def dup(x):
        return jax.device_put(jnp.asarray(np.concatenate([x, x], 0)), bs)

    plain = make_train_step(model, grad_accum=1)
    accum = make_train_step(model, grad_accum=2)
    key = jax.random.PRNGKey(2)

    s1, m1 = plain(fresh_state(), put(images), put(ids), put(mask),
                   put(labels), key)
    s2, m2 = accum(fresh_state(), dup(images), dup(ids), dup(mask),
                   dup(labels), key)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               atol=1e-5)
    wq = s2.params["text_encoder"]["layer0"]["self_attention"]["W_q"]["kernel"]
    assert wq.sharding.spec == P(None, "model")
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        # atol 1e-4: AdamW's g/(√v+ε) amplifies last-bit f32 differences
        # between (g+g)/2 and g on the first step
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dp2_tp4_forward_train_and_checkpoint(tmp_path):
    """4-way tensor parallelism (dp2×tp4): TP rules must hold beyond the
    tp=2 case every other test uses — tp=4 catches divisibility/rule bugs
    a 2-way split can't (VERDICT r3 weak #5). Covers: (a) params actually
    land sharded (shard shapes checked, not just specs — guards the silent
    P() divisibility fallback in variables_shardings), (b) forward logits
    match single-device, (c) a train step executes and keeps params
    TP-sharded, (d) checkpoint save/resume round-trips on the same mesh."""
    from vqa_tpu.data.dataset import create_demo_loaders
    from vqa_tpu.training.train import (
        TrainState,
        Trainer,
        make_optimizer,
        make_train_step,
    )
    from vqa_tpu.utils.config import TrainingConfig

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))

    # (a) real 4-way shards: W_q kernel (16,16) → each shard holds 4 columns
    v_sh = shard_variables(variables, mesh)
    wq = v_sh["params"]["text_encoder"]["layer0"]["self_attention"]["W_q"]["kernel"]
    assert wq.sharding.spec == P(None, "model")
    shard_cols = {s.data.shape[1] for s in wq.addressable_shards}
    assert shard_cols == {wq.shape[1] // 4}
    # at least one more family is genuinely sharded 4-way (FFN columns)
    fc1 = v_sh["params"]["text_encoder"]["layer0"]["ffn"]["fc1"]["kernel"]
    assert {s.data.shape[1] for s in fc1.addressable_shards} == {
        fc1.shape[1] // 4
    }

    # (b) forward parity vs single device
    rng = np.random.default_rng(11)
    images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(4, 64, size=(8, 6)).astype(np.int32)
    mask = np.ones((8, 6), np.int32)

    @jax.jit
    def fwd(v, im, i, m):
        return model.apply(v, im, i, m, train=False)[0]

    base = fwd(variables, images, ids, mask)
    bs = data_sharding(mesh)
    out = fwd(
        v_sh,
        jax.device_put(jnp.asarray(images), bs),
        jax.device_put(jnp.asarray(ids), bs),
        jax.device_put(jnp.asarray(mask), bs),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=2e-4, rtol=2e-4)

    # (c) train step executes with tp=4 collectives; params stay sharded
    tx, _ = make_optimizer(TrainingConfig(warmup_epochs=0), 10)
    state = TrainState.create(
        apply_fn=model.apply, params=v_sh["params"], tx=tx,
        batch_stats=v_sh["batch_stats"],
    )
    labels = jax.device_put(
        jnp.asarray(rng.integers(0, 16, size=(8,)), jnp.int32), bs)
    state2, m = make_train_step(model)(
        state,
        jax.device_put(jnp.asarray(images), bs),
        jax.device_put(jnp.asarray(ids), bs),
        jax.device_put(jnp.asarray(mask), bs),
        labels,
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(m["loss"]))
    wq2 = state2.params["text_encoder"]["layer0"]["self_attention"]["W_q"]["kernel"]
    assert wq2.sharding.spec == P(None, "model")
    assert {s.data.shape[1] for s in wq2.addressable_shards} == {
        wq2.shape[1] // 4
    }

    # (d) checkpoint round-trip through the Trainer on the dp2×tp4 mesh
    train_loader, val_loader = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=8,
        image_size=32, max_question_length=6, vocab_size=64, num_answers=16,
    )
    cfg = TrainingConfig(num_epochs=1, batch_size=4, warmup_epochs=0)
    trainer = Trainer(
        model, init_vqa_model(model, jax.random.PRNGKey(0)),
        train_loader, val_loader, config=cfg, mesh=mesh,
        checkpoint_dir=str(tmp_path),
    )
    trainer.train()
    trainer2 = Trainer(
        model, init_vqa_model(model, jax.random.PRNGKey(9)),
        train_loader, val_loader, config=cfg, mesh=mesh,
        checkpoint_dir=str(tmp_path),
    )
    trainer2.resume("latest")
    assert trainer2.start_epoch == 1
    p1 = trainer.state.params["text_encoder"]["layer0"]["self_attention"]["W_q"]["kernel"]
    p2 = trainer2.state.params["text_encoder"]["layer0"]["self_attention"]["W_q"]["kernel"]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-7)
    assert np.isfinite(trainer2.validate()["val_loss"])


def test_trainer_auto_mesh_clamps_by_global_batch(monkeypatch):
    """On multi-host pods the loaders hold per-PROCESS batch slices; the
    Trainer's auto-mesh must clamp dp by the GLOBAL batch (local × process
    count), not the local size — otherwise it builds a mesh restricted to
    one host's devices (regression)."""
    from vqa_tpu.data.dataset import create_demo_loaders
    from vqa_tpu.training.train import Trainer
    from vqa_tpu.utils.config import TrainingConfig

    tl, vl = create_demo_loaders(
        batch_size=4, eval_batch_size=4, num_samples=8,
        image_size=32, max_question_length=6, vocab_size=64, num_answers=16,
    )
    model = create_vqa_model(**TINY)
    variables = init_vqa_model(model, jax.random.PRNGKey(0))

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    trainer = Trainer(
        model, variables, tl, vl,
        config=TrainingConfig(num_epochs=1, batch_size=4, warmup_epochs=0),
        save_checkpoints=False,
    )
    # local bs 4 × 2 processes = global 8 → all 8 devices usable
    assert trainer.mesh.shape["data"] == 8
