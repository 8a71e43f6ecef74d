"""Checkpoint save/load/resume and torch state_dict conversion."""

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
from pcmseg_tpu.train.checkpoints import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)
from pcmseg_tpu.train.steps import create_train_state, get_learning_rate, set_learning_rate


def tiny_config(**kw):
    kw.setdefault("base_features", 4)
    kw.setdefault("remat", False)
    kw.setdefault("compute_dtype", "float32")
    kw.setdefault("target_size", (16, 16, 16))
    return get_config("quick", **kw)


def test_save_load_roundtrip(tmp_path):
    config = tiny_config()
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model)
    state = set_learning_rate(state, 3.21e-4)
    meta = {"epoch": 7, "monitor": 0.123, "history": {"train_loss": [1.0, 0.5]}}

    path = save_checkpoint(str(tmp_path), "latest", state, meta)
    assert checkpoint_exists(str(tmp_path), "latest")

    template = create_train_state(config, jax.random.key(1), model)
    restored, meta2 = load_checkpoint(path, template)

    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert get_learning_rate(restored) == pytest.approx(3.21e-4)
    assert meta2["epoch"] == 7 and meta2["history"]["train_loss"] == [1.0, 0.5]


def test_save_overwrites(tmp_path):
    config = tiny_config()
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model)
    save_checkpoint(str(tmp_path), "best", state, {"epoch": 1})
    save_checkpoint(str(tmp_path), "best", state, {"epoch": 2})
    template = create_train_state(config, jax.random.key(1), model)
    _, meta = load_checkpoint(str(tmp_path / "best"), template)
    assert meta["epoch"] == 2


def test_torch_state_dict_conversion_full_model():
    """Load reference-layout torch weights and check exact forward parity."""
    torch = pytest.importorskip("torch")
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from measure_torch_baseline import TorchUNet3D

    from pcmseg_tpu.train.checkpoints import (
        batch_stats_from_torch_state_dict,
        params_from_torch_state_dict,
    )

    f = 4
    tm = TorchUNet3D(n_mod=5, n_classes=1, f=f).eval()
    # rename the compact test model's modules to the reference layout
    sd = {}
    for k, v in tm.state_dict().items():
        k = k.replace("inc.", "inc.conv.")
        for i in range(4):
            k = k.replace(f"downs.{i}.", f"down{i+1}.maxpool_conv.1.conv.")
            k = k.replace(f"ups.{i}.", f"up{i+1}.up.")
            k = k.replace(f"up_convs.{i}.", f"up{i+1}.conv.conv.")
        k = k.replace("outc.weight", "outc.weight").replace("outc.bias", "outc.bias")
        sd[k] = v

    config = tiny_config(base_features=f)
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model)
    params = params_from_torch_state_dict(sd, state.params)
    stats = batch_stats_from_torch_state_dict(sd, state.batch_stats)

    x = np.random.default_rng(0).normal(size=(1, 16, 16, 16, 5)).astype(np.float32)
    ours = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    with torch.no_grad():
        theirs = tm(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 4, 1))
    # conv accumulation order differs between XLA and torch; 2e-3 on logits
    # still catches any layout/mapping mistake (those err at O(1))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-3, rtol=1e-2)


def test_torch_export_import_roundtrip():
    """params → torch state_dict → params is the identity."""
    pytest.importorskip("torch")
    from pcmseg_tpu.train.checkpoints import (
        batch_stats_from_torch_state_dict,
        params_from_torch_state_dict,
        params_to_torch_state_dict,
    )

    config = tiny_config()
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(3), model)

    sd = params_to_torch_state_dict(state.params, state.batch_stats)
    assert "inc.conv.0.weight" in sd and "up4.up.weight" in sd
    back = params_from_torch_state_dict(sd, state.params)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    stats_back = batch_stats_from_torch_state_dict(sd, state.batch_stats)
    for a, b in zip(
        jax.tree.leaves(state.batch_stats), jax.tree.leaves(stats_back)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_export_torch_checkpoint_loadable_by_validator(tmp_path):
    """Exported .pth loads back through the torch-checkpoint path."""
    torch = pytest.importorskip("torch")
    from pcmseg_tpu.infer.validate import load_model_state
    from pcmseg_tpu.train.checkpoints import export_torch_checkpoint

    config = tiny_config()
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(4), model)
    path = str(tmp_path / "export.pth")
    export_torch_checkpoint(path, state, {"epoch": 3})

    payload = torch.load(path, map_location="cpu", weights_only=False)
    assert payload["epoch"] == 3
    _, restored = load_model_state(config, path)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_save_is_atomic_symlink_swap(tmp_path):
    """Overwriting leaves exactly one payload dir and never a bare tree."""
    import os

    config = tiny_config()
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model)
    save_checkpoint(str(tmp_path), "latest", state, {"epoch": 1})
    save_checkpoint(str(tmp_path), "latest", state, {"epoch": 2})
    link = tmp_path / "latest"
    assert link.is_symlink()
    payloads = [e for e in os.listdir(tmp_path) if e.startswith(".latest.")]
    assert len(payloads) == 1  # the superseded payload was GC'd
    assert os.readlink(link) == payloads[0]


def test_load_falls_back_to_legacy_dir(tmp_path):
    """A crash mid-migration leaves {name}.legacy; load must recover it."""
    import os

    config = tiny_config()
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model)
    save_checkpoint(str(tmp_path), "latest", state, {"epoch": 5})
    # simulate the crash window: payload renamed aside, symlink not created
    real = tmp_path / os.readlink(tmp_path / "latest")
    (tmp_path / "latest").unlink()
    real.rename(tmp_path / "latest.legacy")
    assert checkpoint_exists(str(tmp_path), "latest")
    template = create_train_state(config, jax.random.key(1), model)
    _, meta = load_checkpoint(str(tmp_path / "latest"), template)
    assert meta["epoch"] == 5


def test_adopt_checkpoint_config_from_meta(tmp_path):
    """validate/predict must rebuild the template from the checkpoint's own
    config snapshot (ADVICE round-1: opaque Orbax mismatch otherwise)."""
    from pcmseg_tpu.infer.validate import adopt_checkpoint_config

    config = tiny_config(base_features=8, norm_layer="group", normalize="zscore")
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model)
    path = save_checkpoint(
        str(tmp_path), "best", state, {"epoch": 1, "config": config.to_dict()}
    )

    cli_config = tiny_config()  # defaults: base 4, batch norm, percentile
    adopted = adopt_checkpoint_config(cli_config, path)
    assert adopted.base_features == 8
    assert adopted.norm_layer == "group"
    assert adopted.normalize == "zscore"
    # explicitly-set CLI flags win over the snapshot
    kept = adopt_checkpoint_config(cli_config, path, explicit=("normalize",))
    assert kept.normalize == cli_config.normalize
    assert kept.base_features == 8


def test_adopt_checkpoint_config_pth_defaults_minmax(tmp_path):
    from pcmseg_tpu.infer.validate import adopt_checkpoint_config

    cfg = tiny_config()  # normalize='percentile' default
    adopted = adopt_checkpoint_config(cfg, str(tmp_path / "ref.pth"))
    assert adopted.normalize == "minmax"
    kept = adopt_checkpoint_config(cfg, str(tmp_path / "ref.pth"), explicit=("normalize",))
    assert kept.normalize == "percentile"


def test_adopt_checkpoint_config_pth_with_embedded_snapshot(tmp_path):
    """Our exported .pth files carry the training config in the payload
    (run.py export) — they must self-describe like Orbax dirs do, instead
    of falling to the reference-.pth minmax default."""
    import torch

    from pcmseg_tpu.infer.validate import adopt_checkpoint_config

    trained = tiny_config(base_features=8, normalize="zscore")
    path = str(tmp_path / "exported.pth")
    torch.save({"model_state_dict": {}, "config": trained.to_dict()}, path)

    adopted = adopt_checkpoint_config(tiny_config(), path)
    assert adopted.base_features == 8
    assert adopted.normalize == "zscore"  # not the minmax fallback
    kept = adopt_checkpoint_config(tiny_config(), path, explicit=("normalize",))
    assert kept.normalize == tiny_config().normalize


def test_torch_import_shape_mismatch_is_readable(tmp_path):
    """A .pth whose base_features disagrees with the template must raise a
    named architecture error up front, not a flax scope error mid-apply."""
    import torch

    from pcmseg_tpu.train.checkpoints import params_from_torch_state_dict

    template = {"inc": {"conv0": {"kernel": np.zeros((3, 3, 3, 5, 8))}}}
    sd = {"inc.conv.0.weight": torch.zeros((4, 5, 3, 3, 3))}
    with pytest.raises(ValueError, match="base_features=4"):
        params_from_torch_state_dict(sd, template)


def test_async_checkpoint_saves_and_resumes(tmp_path):
    """async_checkpoint=True: saves overlap training via a writer thread,
    end-of-training drains, and the checkpoints resume exactly like
    synchronous ones."""
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=3, shape=(12, 12, 12))
    cfg = tiny_config(
        data_dir=root,
        save_dir=str(tmp_path / "ckpt"),
        num_epochs=2,
        validation=False,
        early_stopping=False,
        async_checkpoint=True,
        data_parallel=1,
    )
    t = Trainer(cfg)
    assert t._async_ckpt
    h = t.train()
    assert len(h["train_loss"]) == 2
    assert t._ckpt_futures == []  # drained at end of training

    from pcmseg_tpu.train.checkpoints import checkpoint_exists, load_checkpoint

    assert checkpoint_exists(cfg.save_dir, "latest")
    assert checkpoint_exists(cfg.save_dir, "best")

    t2 = Trainer(cfg.replace(resume=True, num_epochs=3))
    assert t2.start_epoch == 2  # resumed from the async-written latest
    h2 = t2.train()
    assert len(h2["train_loss"]) == 3  # history carried + one new epoch


def test_latest_meta_carries_updated_best_monitor(tmp_path):
    """latest(e)'s meta must already reflect a best set AT epoch e, so a
    resume can never re-award 'best' to a later, worse epoch."""
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.train.checkpoints import load_checkpoint
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=3, shape=(12, 12, 12))
    cfg = tiny_config(
        data_dir=root,
        save_dir=str(tmp_path / "ckpt"),
        num_epochs=1,
        validation=False,
        early_stopping=False,
        data_parallel=1,
    )
    t = Trainer(cfg)
    h = t.train()

    state_t = Trainer(cfg)  # fresh template for loading
    _, meta = load_checkpoint(
        str(tmp_path / "ckpt" / "latest"), state_t.state
    )
    # epoch 0 is necessarily the best epoch; its latest meta must carry
    # the post-update best_monitor (== its own monitor), not +inf
    assert meta["best_monitor"] == pytest.approx(h["train_loss"][0])

    t2 = Trainer(cfg.replace(resume=True))
    assert t2.best_monitor == pytest.approx(h["train_loss"][0])


def test_copy_checkpoint_no_device_fetch(tmp_path):
    """'best' as a host-side copy of 'latest': loadable, independent of
    later overwrites of the source, atomic symlink layout."""
    import os

    from pcmseg_tpu.train.checkpoints import copy_checkpoint

    config = tiny_config()
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model)
    save_checkpoint(str(tmp_path), "latest", state, {"epoch": 3, "monitor": 0.2})
    copy_checkpoint(str(tmp_path), "latest", "best")

    assert os.path.islink(tmp_path / "best")
    template = create_train_state(config, jax.random.key(1), model)
    restored, meta = load_checkpoint(str(tmp_path / "best"), template)
    assert meta["epoch"] == 3
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # overwriting 'latest' afterwards must not disturb the copied 'best'
    state2 = create_train_state(config, jax.random.key(2), model)
    save_checkpoint(str(tmp_path), "latest", state2, {"epoch": 4})
    _, meta_best = load_checkpoint(str(tmp_path / "best"), template)
    assert meta_best["epoch"] == 3
    # and re-copying points 'best' at the new state
    copy_checkpoint(str(tmp_path), "latest", "best")
    _, meta_best2 = load_checkpoint(str(tmp_path / "best"), template)
    assert meta_best2["epoch"] == 4


def test_trainer_best_is_copy_of_latest(tmp_path):
    """The epoch save path serializes once: best/ and latest/ hold equal
    states after training, including in async mode."""
    import os

    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=4, shape=(20, 20, 20), seed=5)
    for sub, async_ckpt in (("sync", False), ("async", True)):
        save_dir = str(tmp_path / sub)
        config = tiny_config(
            data_dir=root, save_dir=save_dir, num_epochs=2, batch_size=2,
            validation=False, early_stopping=False, save_frequency=2,
            async_checkpoint=async_ckpt,
        )
        Trainer(config).train()
        template = create_train_state(
            config, jax.random.key(1), UNet3D.from_config(config)
        )
        latest, meta_l = load_checkpoint(os.path.join(save_dir, "latest"), template)
        best, meta_b = load_checkpoint(os.path.join(save_dir, "best"), template)
        epoch2, _ = load_checkpoint(os.path.join(save_dir, "epoch_2"), template)
        # training loss decreases monotonically here, so best == latest ==
        # the periodic epoch_2 snapshot
        assert meta_l["epoch"] == 1 and meta_b["epoch"] == 1
        for a, b, c in zip(
            jax.tree.leaves(latest.params),
            jax.tree.leaves(best.params),
            jax.tree.leaves(epoch2.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
