"""PredictionServer (serve verb) + cache warmer: resident-predictor loop
over arriving case dirs, idempotent restart, CLI wiring."""

import pytest

# compile-heavy on a 1-core host (measured; see pyproject's marker
# registration) - excluded from the quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import os
import shutil

import numpy as np
import pytest
from dataclasses import replace

from pcmseg_tpu.data.io import read_volume
from pcmseg_tpu.data.synthetic import make_synthetic_dataset

from test_e2e import tiny_config

N_CASES = 4


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """Tiny trained checkpoint + data root shared by the serve tests."""
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path_factory.mktemp("serve_data"))
    make_synthetic_dataset(root, n_cases=N_CASES, shape=(20, 20, 20), seed=11)
    save_dir = str(tmp_path_factory.mktemp("serve_ckpt"))
    config = tiny_config(root, save_dir, num_epochs=1, validation=False)
    Trainer(config).train()
    return config, root, save_dir


def _stage_case(data_root, modalities, case_id, dest_root):
    case_dir = os.path.join(dest_root, case_id)
    for m in modalities:
        os.makedirs(os.path.join(case_dir, m), exist_ok=True)
        shutil.copy(
            os.path.join(data_root, "BPH-PCA", "BPH", m, f"{case_id}.nii.gz"),
            os.path.join(case_dir, m, "image.nii.gz"),
        )
    return case_dir


def test_server_run_once_and_idempotent(served, tmp_path):
    from pcmseg_tpu.infer.serve import PredictionServer

    config, root, save_dir = served
    input_root = str(tmp_path / "inbox")
    output_dir = str(tmp_path / "outbox")
    _stage_case(root, config.modalities, "case000", input_root)
    _stage_case(root, config.modalities, "case001", input_root)
    # a non-case dir must be ignored, not crash the scan
    os.makedirs(os.path.join(input_root, "not_a_case"))

    server = PredictionServer(
        config, os.path.join(save_dir, "best"), input_root, output_dir,
        min_age=0.0,
    )
    assert server.pending_cases() == ["case000", "case001"]
    stats = server.run_once()
    assert stats == {"done": 2, "failed": 0, "skipped": 0, "waiting": 0}
    for cid in ("case000", "case001"):
        out = read_volume(os.path.join(output_dir, cid, "segmentation.nii.gz"))
        assert set(np.unique(out.data)) <= {0, 1}

    # second pass: outputs exist → nothing pending, nothing re-segmented
    assert server.pending_cases() == []
    assert server.run_once()["done"] == 2


def test_server_watch_picks_up_new_case_and_stops(served, tmp_path):
    from pcmseg_tpu.infer.serve import PredictionServer

    config, root, save_dir = served
    input_root = str(tmp_path / "inbox")
    output_dir = str(tmp_path / "outbox")
    os.makedirs(input_root)
    server = PredictionServer(
        config, os.path.join(save_dir, "best"), input_root, output_dir,
        min_age=0.0,
    )
    # empty first poll; case arrives before the second
    _stage_case(root, config.modalities, "case002", input_root)
    stats = server.run(poll_interval=0.01, max_polls=2)
    assert stats["done"] == 1
    assert os.path.exists(
        os.path.join(output_dir, "case002", "segmentation.nii.gz")
    )

    # stop_file halts the loop even with max_polls unset
    stop = str(tmp_path / "STOP")
    open(stop, "w").close()
    stats = server.run(poll_interval=0.01, stop_file=stop)
    assert stats["done"] == 1  # nothing new


def test_server_survives_bad_case(served, tmp_path):
    from pcmseg_tpu.infer.serve import PredictionServer

    config, root, save_dir = served
    input_root = str(tmp_path / "inbox")
    output_dir = str(tmp_path / "outbox")
    case_dir = _stage_case(root, config.modalities, "case003", input_root)
    # corrupt one modality file → read fails for that case only
    bad = os.path.join(case_dir, config.modalities[0], "image.nii.gz")
    with open(bad, "wb") as f:
        f.write(b"garbage")

    server = PredictionServer(
        config, os.path.join(save_dir, "best"), input_root, output_dir,
        min_age=0.0,
    )
    stats = server.run_once()
    assert stats["failed"] == 1 and stats["done"] == 0


def test_cli_serve_once(served, tmp_path, capsys):
    from pcmseg_tpu.cli.main import main

    config, root, save_dir = served
    input_root = str(tmp_path / "inbox")
    output_dir = str(tmp_path / "outbox")
    _stage_case(root, config.modalities, "case000", input_root)
    rc = main(
        [
            "serve",
            "--model_path", os.path.join(save_dir, "best"),
            "--input_root", input_root,
            "--output_dir", output_dir,
            "--data_dir", root,
            "--once",
        ]
    )
    assert rc == 0
    assert "served: 1 done" in capsys.readouterr().out
    assert os.path.exists(
        os.path.join(output_dir, "case000", "segmentation.nii.gz")
    )


def test_warm_cache_populates_and_shards(served, tmp_path):
    from pcmseg_tpu.data.warm_cache import warm_cache

    config, root, _ = served
    cache_dir = str(tmp_path / "cache")
    cfg = config.replace(cache_dir=cache_dir)

    # two-process sharding covers disjoint slices of the case list
    s0 = warm_cache(cfg, num_threads=2, process_index=0, process_count=2)
    s1 = warm_cache(cfg, num_threads=2, process_index=1, process_count=2)
    assert s0["warmed"] + s1["warmed"] == N_CASES
    assert s0["failed"] == s1["failed"] == 0
    npz = [f for f in os.listdir(cache_dir) if f.endswith(".npz")]
    assert len(npz) == N_CASES

    # idempotent: second run only hits the cache
    again = warm_cache(cfg, num_threads=2)
    assert again["warmed"] == 0 and again["already_cached"] == N_CASES

    with pytest.raises(ValueError):
        # cache_dir defaults to 'auto' now; disabling it must still raise
        warm_cache(replace(config, cache_dir=None))
    with pytest.raises(ValueError):
        warm_cache(cfg, process_index=2, process_count=2)


def test_cli_warm_cache(served, tmp_path, capsys):
    from pcmseg_tpu.cli.main import main

    config, root, _ = served
    cache_dir = str(tmp_path / "cache_cli")
    rc = main(
        [
            "warm-cache",
            "--data_dir", root,
            "--cache_dir", cache_dir,
            "--target_size", "16", "16", "16",
            "--num_threads", "2",
        ]
    )
    assert rc == 0
    assert f"warmed {N_CASES}" in capsys.readouterr().out


def test_server_waits_for_quiescence(served, tmp_path):
    """Fresh files (possibly mid-upload) aren't served until the case dir
    has been quiescent for min_age; min_age=0 disables the guard. The age
    check uses max(mtime, ctime), so a sleep is the only honest way to age
    a file (utime can backdate mtime but refreshes ctime — exactly the
    tar/rsync-preserved-mtime hole the ctime term closes)."""
    import time as _time

    from pcmseg_tpu.infer.serve import PredictionServer

    config, root, save_dir = served
    input_root = str(tmp_path / "inbox")
    output_dir = str(tmp_path / "outbox")
    case_dir = os.path.join(input_root, "case000")
    # only 2 of 5 modalities present (upload in progress)
    for m in config.modalities[:2]:
        os.makedirs(os.path.join(case_dir, m), exist_ok=True)
        shutil.copy(
            os.path.join(root, "BPH-PCA", "BPH", m, "case000.nii.gz"),
            os.path.join(case_dir, m, "image.nii.gz"),
        )
    # mtime-backdating alone must NOT make a fresh file look old (ctime)
    old = _time.time() - 7200
    for base, _, files in os.walk(case_dir):
        for f in files:
            os.utime(os.path.join(base, f), (old, old))

    server = PredictionServer(
        config, os.path.join(save_dir, "best"), input_root, output_dir,
        min_age=2.0,
    )
    assert server.pending_cases() == []  # freshly created → not ready
    assert server.stats["waiting"] == 1
    assert server.run_once()["done"] == 0

    _time.sleep(2.1)  # genuinely quiescent now
    assert server.pending_cases() == ["case000"]
    assert server.stats["waiting"] == 0

    # min_age=0: serve immediately regardless of completeness/age
    server0 = PredictionServer(
        config, os.path.join(save_dir, "best"), input_root,
        str(tmp_path / "outbox0"), min_age=0.0,
    )
    assert server0.pending_cases() == ["case000"]
    assert server0.run_once()["done"] == 1


def test_prediction_write_is_atomic(served, tmp_path, monkeypatch):
    """A crash mid-write must not leave a truncated output posing as the
    completion marker."""
    from pcmseg_tpu.infer.predict import Predictor

    config, root, save_dir = served
    case_dir = _stage_case(root, config.modalities, "case001",
                           str(tmp_path / "in"))
    predictor = Predictor(config, os.path.join(save_dir, "best"))
    out_path = str(tmp_path / "out" / "seg.nii.gz")

    import pcmseg_tpu.infer.predict as predict_mod

    real_write = predict_mod.write_volume

    def crashing_write(vol, path):
        real_write(vol, path)  # tmp file fully written...
        raise RuntimeError("killed mid-save")  # ...but crash before rename

    monkeypatch.setattr(predict_mod, "write_volume", crashing_write)
    with pytest.raises(RuntimeError):
        predictor.predict_and_save(case_dir, out_path)
    assert not os.path.exists(out_path)  # no marker, no truncated file
    assert not [
        f for f in os.listdir(os.path.dirname(out_path))
        if f.startswith(".tmp-")
    ]

    monkeypatch.setattr(predict_mod, "write_volume", real_write)
    predictor.predict_and_save(case_dir, out_path)
    assert os.path.exists(out_path)


def test_serve_quarantines_repeat_failures(served, tmp_path, monkeypatch):
    """A case that keeps failing is retried max_attempts times, counted as
    ONE failed case, then quarantined out of pending_cases."""
    from pcmseg_tpu.infer.serve import PredictionServer

    config, root, save_dir = served
    input_root = str(tmp_path / "q_inbox")
    _stage_case(root, config.modalities, "case000", input_root)
    server = PredictionServer(
        config, os.path.join(save_dir, "best"), input_root,
        str(tmp_path / "qout"), min_age=0, max_attempts=2,
    )
    calls = {"n": 0}

    def boom(case_id):
        calls["n"] += 1
        raise RuntimeError("corrupt case")

    monkeypatch.setattr(server, "_load", boom)
    server.run_once()  # attempt 1 for every pending case
    server.run_once()  # attempt 2 -> quarantine
    n_cases = calls["n"] // 2
    assert n_cases >= 1
    server.run_once()  # all quarantined: no further attempts
    assert calls["n"] == 2 * n_cases
    assert server.stats["failed"] == n_cases  # distinct cases, not attempts
    assert server.stats["skipped"] == n_cases
    assert server.pending_cases() == []


def test_cli_serve_profile_writes_trace(served, tmp_path):
    """--profile on serve dumps a jax.profiler trace of the served cases,
    flushed even when the run is shorter than the trace window."""
    from pcmseg_tpu.cli.main import main

    config, root, save_dir = served
    input_root = str(tmp_path / "inbox")
    output_dir = str(tmp_path / "outbox")
    profile_dir = tmp_path / "trace"
    _stage_case(root, config.modalities, "case000", input_root)
    rc = main(
        [
            "serve",
            "--model_path", os.path.join(save_dir, "best"),
            "--input_root", input_root,
            "--output_dir", output_dir,
            "--data_dir", root,
            "--once",
            "--profile", str(profile_dir),
            "--profile_steps", "3",
        ]
    )
    assert rc == 0
    dumped = [p for p in profile_dir.rglob("*") if p.is_file()]
    assert dumped, "serve --profile wrote no profiler dump"


def test_cli_predict_profile_writes_trace(served, tmp_path):
    from pcmseg_tpu.cli.main import main

    config, root, save_dir = served
    input_root = str(tmp_path / "inbox")
    output_dir = str(tmp_path / "outbox")
    profile_dir = tmp_path / "trace_predict"
    case_dir = _stage_case(root, config.modalities, "case001", input_root)
    rc = main(
        [
            "predict",
            "--model_path", os.path.join(save_dir, "best"),
            "--input_dir", case_dir,
            "--output_dir", output_dir,
            "--data_dir", root,
            "--profile", str(profile_dir),
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(output_dir, "segmentation.nii.gz"))
    dumped = [p for p in profile_dir.rglob("*") if p.is_file()]
    assert dumped, "predict --profile wrote no profiler dump"
