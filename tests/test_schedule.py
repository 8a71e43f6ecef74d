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
