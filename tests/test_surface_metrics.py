"""Surface-distance metrics (ops/surface.py): hand-computed geometries,
spacing handling, empty-mask conventions, and the validator wiring."""

import numpy as np
import pytest

from pcmseg_tpu.ops.surface import (
    assd,
    case_surface_metrics,
    hausdorff_distance,
    surface_dice,
    surface_distances,
)

SHAPE = (24, 24, 24)


def cube(lo, hi, shape=SHAPE):
    m = np.zeros(shape, bool)
    m[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = True
    return m


def plane(z, shape=SHAPE):
    m = np.zeros(shape, bool)
    m[z] = True
    return m


def test_identical_masks_are_perfect():
    m = cube((4, 4, 4), (12, 12, 12))
    d_p2t, d_t2p = surface_distances(m, m)
    assert d_p2t.size > 0 and (d_p2t == 0).all() and (d_t2p == 0).all()
    assert hausdorff_distance(m, m) == 0.0
    assert assd(m, m) == 0.0
    assert surface_dice(m, m, tolerance=0.0) == 1.0


def test_parallel_planes_have_exact_uniform_distance():
    # every surface voxel of one plane is exactly 3 voxels from the other
    p, t = plane(5), plane(8)
    d_p2t, d_t2p = surface_distances(p, t)
    assert np.allclose(d_p2t, 3.0) and np.allclose(d_t2p, 3.0)
    assert hausdorff_distance(p, t) == pytest.approx(3.0)
    assert assd(p, t) == pytest.approx(3.0)
    assert surface_dice(p, t, tolerance=3.0) == 1.0
    assert surface_dice(p, t, tolerance=2.9) == 0.0


def test_classical_hausdorff_of_shifted_cube():
    # shifting a solid cube k voxels along one axis moves every surface
    # voxel at most k from the other surface, and the two faces normal to
    # the shift exactly k -> Hausdorff (p=100) == k
    a = cube((4, 4, 4), (12, 12, 12))
    b = cube((7, 4, 4), (15, 12, 12))
    assert hausdorff_distance(a, b, percentile=100.0) == pytest.approx(3.0)


def test_spacing_scales_physical_distance():
    p, t = plane(5), plane(8)
    # data axis 0 has 2.0 mm voxels -> the 3-voxel gap is 6 mm
    assert hausdorff_distance(p, t, spacing=(2.0, 1.0, 1.0)) == pytest.approx(6.0)
    assert assd(p, t, spacing=(2.0, 1.0, 1.0)) == pytest.approx(6.0)
    # spacing on the in-plane axes does not change an axis-0 offset
    assert assd(p, t, spacing=(1.0, 7.0, 7.0)) == pytest.approx(3.0)


def test_percentile_ignores_outlier_island():
    # large agreeing plates + a single distant speck in pred: the 50th
    # percentile ignores it, the classical Hausdorff is dominated by it
    a = cube((4, 0, 0), (6, 24, 24))
    b = a.copy()
    b[20, 12, 12] = True
    hd_robust = hausdorff_distance(a, b, percentile=50.0)
    hd_max = hausdorff_distance(a, b, percentile=100.0)
    assert hd_robust == pytest.approx(0.0)
    assert hd_max >= 14.0


def test_empty_mask_conventions():
    empty = np.zeros(SHAPE, bool)
    m = cube((4, 4, 4), (8, 8, 8))
    assert hausdorff_distance(empty, empty) == 0.0
    assert assd(empty, empty) == 0.0
    assert surface_dice(empty, empty) == 1.0
    assert np.isinf(hausdorff_distance(m, empty))
    assert np.isinf(assd(empty, m))
    assert surface_dice(m, empty) == 0.0
    both = case_surface_metrics(empty, m)
    assert np.isinf(both["hd95"]) and both["surface_dice"] == 0.0


def test_channel_dim_accepted():
    m = cube((4, 4, 4), (12, 12, 12))
    assert hausdorff_distance(m[..., None], m.astype(np.float32)[..., None]) == 0.0


def test_case_surface_metrics_matches_wrappers():
    a = cube((4, 4, 4), (12, 12, 12))
    b = cube((6, 4, 4), (14, 12, 12))
    got = case_surface_metrics(a, b, spacing=(1.5, 1.0, 1.0), tolerance=2.0)
    assert got["hd95"] == pytest.approx(
        hausdorff_distance(a, b, spacing=(1.5, 1.0, 1.0))
    )
    assert got["assd"] == pytest.approx(assd(a, b, spacing=(1.5, 1.0, 1.0)))
    assert got["surface_dice"] == pytest.approx(
        surface_dice(a, b, spacing=(1.5, 1.0, 1.0), tolerance=2.0)
    )


def test_non_3d_input_rejected():
    with pytest.raises(ValueError):
        surface_distances(np.zeros((4, 4)), np.zeros((4, 4)))


@pytest.mark.slow
def test_validator_reports_surface_metrics(tmp_path):
    """End-to-end wiring: validate --surface_metrics adds per-case hd95 /
    assd / surface_dice plus defined-only averages, JSON-safe."""
    import json
    import os

    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.data.synthetic import make_synthetic_dataset
    from pcmseg_tpu.infer.validate import Validator
    from pcmseg_tpu.train.trainer import Trainer

    root = str(tmp_path / "data")
    make_synthetic_dataset(root, n_cases=4, shape=(20, 20, 20), seed=11)
    save_dir = str(tmp_path / "ckpt")
    config = get_config(
        "standard",
        data_dir=root,
        save_dir=save_dir,
        base_features=4,
        remat=False,
        compute_dtype="float32",
        target_size=(16, 16, 16),
        batch_size=2,
        num_epochs=1,
        val_fraction=0.25,
        early_stopping=False,
        save_frequency=0,
        surface_metrics=True,
    )
    Trainer(config).train()
    v = Validator(config, os.path.join(save_dir, "best"))
    results = v.validate()
    assert results["surface_units"] == "voxel"
    for rec in results["case_results"]:
        assert set(rec) >= {"case_id", "dice", "iou", "hd95", "assd",
                            "surface_dice"}
        for k in ("hd95", "assd", "surface_dice"):
            assert rec[k] is None or np.isfinite(rec[k])
    # averages present; surface_dice is always defined so its mean must be
    assert 0.0 <= results["avg_surface_dice"] <= 1.0
    # artifact is valid JSON including any null distances
    saved = json.load(open(os.path.join(save_dir, "validation_results.json")))
    assert saved["avg_surface_dice"] == pytest.approx(
        results["avg_surface_dice"]
    )
