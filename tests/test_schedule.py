"""ReduceLROnPlateau / EarlyStopping semantics vs torch's scheduler."""

import pytest

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.train.schedule import EarlyStopping, ReduceLROnPlateau

torch = pytest.importorskip("torch")


def test_plateau_reduces_after_patience():
    s = ReduceLROnPlateau(lr=1e-4, patience=2, factor=0.5)
    s.step(1.0)  # best=1.0
    assert s.step(1.0) == 1e-4  # bad 1
    assert s.step(1.0) == 1e-4  # bad 2
    assert s.step(1.0) == pytest.approx(5e-5)  # bad 3 > patience → reduce


def test_plateau_improvement_resets():
    s = ReduceLROnPlateau(lr=1e-4, patience=2, factor=0.5)
    s.step(1.0)
    s.step(1.0)
    s.step(0.5)  # improvement resets bad counter
    s.step(0.5)
    s.step(0.5)
    assert s.lr == 1e-4
    assert s.step(0.5) == pytest.approx(5e-5)


def test_plateau_min_lr_floor():
    s = ReduceLROnPlateau(lr=1e-7, patience=0, factor=0.5, min_lr=1e-7)
    s.step(1.0)
    for _ in range(5):
        s.step(1.0)
    assert s.lr == pytest.approx(1e-7)


def test_plateau_matches_torch_trajectory():
    """Run identical metric sequences through ours and torch's scheduler."""
    metric_seq = [1.0, 0.9, 0.95, 0.95, 0.95, 0.95, 0.4, 0.4, 0.41, 0.41, 0.41, 0.41]
    ours = ReduceLROnPlateau(lr=1e-3, patience=3, factor=0.5, threshold=1e-4)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-3)
    ts = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=3, threshold=1e-4
    )
    for m in metric_seq:
        ours.step(m)
        ts.step(m)
        torch_lr = opt.param_groups[0]["lr"]
        assert ours.lr == pytest.approx(torch_lr), (m, ours.lr, torch_lr)


def test_plateau_state_roundtrip():
    s = ReduceLROnPlateau(lr=1e-4, patience=2)
    s.step(1.0)
    s.step(1.1)
    d = s.state_dict()
    s2 = ReduceLROnPlateau(lr=9.0, patience=2)
    s2.load_state_dict(d)
    assert s2.lr == s.lr and s2.best == s.best and s2.num_bad_epochs == 1


def test_from_config():
    c = get_config("standard")
    s = ReduceLROnPlateau.from_config(c)
    assert s.lr == c.learning_rate
    assert s.patience == 10 and s.factor == 0.5 and s.min_lr == 1e-7


def test_early_stopping():
    es = EarlyStopping(patience=3)
    assert not es.step(1.0)
    assert not es.step(1.0)
    assert not es.step(1.0)
    assert es.step(1.0)  # 3 bad epochs → stop
    es2 = EarlyStopping(patience=3)
    for m in [1.0, 0.9, 1.0, 0.8, 1.0, 1.0]:
        assert not es2.step(m)


def test_early_stopping_state_roundtrip():
    es = EarlyStopping(patience=5)
    es.step(1.0)
    es.step(2.0)
    d = es.state_dict()
    es2 = EarlyStopping(patience=5)
    es2.load_state_dict(d)
    assert es2.best == 1.0 and es2.num_bad_epochs == 1


# ---- EpochSchedule / warmup / make_scheduler (beyond-reference) ------------

import math

from pcmseg_tpu.train.schedule import EpochSchedule, WarmupPlateau, make_scheduler


def test_cosine_endpoints_and_midpoint():
    s = EpochSchedule(kind="cosine", base_lr=1e-3, total_epochs=10, min_lr=1e-5)
    assert s.lr_at(0) == pytest.approx(1e-3)
    assert s.lr_at(5) == pytest.approx(1e-5 + 0.5 * (1e-3 - 1e-5))
    assert s.lr_at(10) == pytest.approx(1e-5)
    assert s.lr_at(99) == pytest.approx(1e-5)  # clamped past total


def test_poly_matches_nnunet_formula():
    s = EpochSchedule(kind="poly", base_lr=1e-2, total_epochs=100, poly_power=0.9)
    for e in (0, 30, 99, 100):
        t = min(e / 100, 1.0)
        assert s.lr_at(e) == pytest.approx(1e-2 * (1.0 - t) ** 0.9)


def test_constant_holds_base_lr():
    s = EpochSchedule(kind="constant", base_lr=3e-4, total_epochs=7)
    assert {s.lr_at(e) for e in range(9)} == {3e-4}


def test_warmup_ramp_then_decay():
    s = EpochSchedule(
        kind="cosine", base_lr=9e-4, total_epochs=13, warmup_epochs=3
    )
    assert s.lr_at(0) == pytest.approx(3e-4)
    assert s.lr_at(1) == pytest.approx(6e-4)
    assert s.lr_at(2) == pytest.approx(9e-4)
    # decay restarts from base over the remaining 10 epochs
    assert s.lr_at(3) == pytest.approx(9e-4)
    assert s.lr_at(8) == pytest.approx(0.5 * 9e-4)  # cosine midpoint


def test_step_advances_like_lr_at():
    s = EpochSchedule(kind="poly", base_lr=1e-3, total_epochs=5)
    seen = [s.lr]
    for _ in range(4):
        seen.append(s.step(metric=123.0))  # metric ignored
    assert seen == pytest.approx([s.lr_at(e) for e in range(5)])


def test_epoch_schedule_state_roundtrip():
    s = EpochSchedule(kind="cosine", base_lr=1e-3, total_epochs=10)
    s.step(0.0)
    s.step(0.0)
    s2 = EpochSchedule(kind="cosine", base_lr=1e-3, total_epochs=10)
    s2.load_state_dict(s.state_dict())
    assert s2.lr == s.lr and s2.epochs_done == 2


def test_warmup_plateau_protects_patience_then_hands_over():
    inner = ReduceLROnPlateau(lr=1e-3, patience=0, factor=0.5)
    s = WarmupPlateau(inner=inner, base_lr=1e-3, warmup_epochs=2)
    assert s.lr == pytest.approx(5e-4)  # epoch 0 runs at base/2
    # warmup metrics must not trip the zero-patience plateau
    assert s.step(1.0) == pytest.approx(1e-3)  # epoch 1 at full base
    assert s.step(1.0) == pytest.approx(1e-3)  # handover epoch, no count
    s.step(1.0)  # best=1.0
    assert s.step(1.0) == pytest.approx(5e-4)  # now plateau reduces


def test_warmup_plateau_state_roundtrip():
    s = WarmupPlateau(
        inner=ReduceLROnPlateau(lr=1e-3, patience=1), base_lr=1e-3,
        warmup_epochs=1,
    )
    s.step(1.0)
    s.step(1.0)
    s.step(1.0)
    s2 = WarmupPlateau(
        inner=ReduceLROnPlateau(lr=1e-3, patience=1), base_lr=1e-3,
        warmup_epochs=1,
    )
    s2.load_state_dict(s.state_dict())
    assert s2.lr == s.lr
    assert s2.inner.num_bad_epochs == s.inner.num_bad_epochs


def test_make_scheduler_dispatch():
    base = dict(learning_rate=2e-4, num_epochs=11, min_lr=1e-6)
    assert isinstance(
        make_scheduler(get_config("standard", **base)), ReduceLROnPlateau
    )
    assert isinstance(
        make_scheduler(get_config("standard", warmup_epochs=2, **base)),
        WarmupPlateau,
    )
    cos = make_scheduler(get_config("standard", scheduler="cosine", **base))
    assert isinstance(cos, EpochSchedule)
    assert (cos.kind, cos.base_lr, cos.total_epochs, cos.min_lr) == (
        "cosine", 2e-4, 11, 1e-6
    )


def test_bad_scheduler_name_rejected():
    with pytest.raises(ValueError, match="scheduler"):
        get_config("standard", scheduler="linear")


@pytest.mark.slow
def test_trainer_drives_injected_lr_from_schedule(tmp_path):
    """The Trainer installs the schedule's epoch-0 rate (warmup!) before
    the first step and advances it each epoch via set_learning_rate."""
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.train.steps import get_learning_rate
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=4, shape=(16, 16, 16), seed=5)
    config = get_config(
        "quick",
        data_dir=root,
        save_dir=str(tmp_path / "ckpt"),
        base_features=4,
        remat=False,
        compute_dtype="float32",
        target_size=(16, 16, 16),
        num_epochs=2,
        scheduler="cosine",
        warmup_epochs=1,
        learning_rate=8e-4,
        save_frequency=0,
    )
    trainer = Trainer(config)
    sched = trainer.scheduler
    assert isinstance(sched, EpochSchedule)
    assert sched.lr == pytest.approx(8e-4)  # 1-epoch warmup: full base at e0
    trainer.train()
    # after 2 epochs the injected rate is the epoch-2 cosine value
    assert get_learning_rate(trainer.state) == pytest.approx(sched.lr_at(2))
