"""PredictionServer (serve verb) + cache warmer: resident-predictor loop
over arriving case dirs, idempotent restart, CLI wiring."""

import os
import shutil

import numpy as np
import pytest

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
        config, os.path.join(save_dir, "best"), input_root, output_dir
    )
    assert server.pending_cases() == ["case000", "case001"]
    stats = server.run_once()
    assert stats == {"done": 2, "failed": 0, "skipped": 0}
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
        config, os.path.join(save_dir, "best"), input_root, output_dir
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
        config, os.path.join(save_dir, "best"), input_root, output_dir
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
        warm_cache(config)  # no cache_dir set
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
