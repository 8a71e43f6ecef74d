"""Edge cases: .mha trees, non-cubic targets, validator subsets."""

import os

import numpy as np
import pytest

from pcmseg_tpu.core.config import DEFAULT_MODALITIES
from pcmseg_tpu.data import Volume, write_mha
from pcmseg_tpu.data.dataset import LABEL_DIR, ProstateDataset
from pcmseg_tpu.data.resample import resample_array
from pcmseg_tpu.data.synthetic import make_case


@pytest.fixture(scope="module")
def mha_root(tmp_path_factory):
    """A BPH tree written entirely as .mha files."""
    root = str(tmp_path_factory.mktemp("mha_data"))
    rng = np.random.default_rng(1)
    for m in DEFAULT_MODALITIES:
        os.makedirs(os.path.join(root, "BPH-PCA", "BPH", m))
    os.makedirs(os.path.join(root, "BPH-PCA", LABEL_DIR, "BPH"))
    for cid in ["mcase0", "mcase1", "mcase2"]:
        images, mask = make_case(rng, (10, 10, 10), 5)
        for m, img in zip(DEFAULT_MODALITIES, images):
            write_mha(
                Volume(img, spacing=(1, 1, 2)),
                os.path.join(root, "BPH-PCA", "BPH", m, cid + ".mha"),
            )
        write_mha(
            Volume(mask.astype(np.uint8), spacing=(1, 1, 2)),
            os.path.join(root, "BPH-PCA", LABEL_DIR, "BPH", cid + ".mha"),
            compressed=True,
        )
    return root


def test_mha_tree_discovery_and_loading(mha_root):
    """.mha support the reference README promised but never delivered."""
    ds = ProstateDataset(mha_root, target_size=(12, 12, 12))
    assert ds.case_ids == ["mcase0", "mcase1", "mcase2"]
    s = ds[0]
    assert s["image"].shape == (12, 12, 12, 5)
    assert s["label"].sum() > 0


def test_non_cubic_target_size(mha_root):
    """SURVEY.md §8.10: the reference's SITK size-order bug only stayed
    hidden because targets were cubic; ours must be axis-correct."""
    ds = ProstateDataset(mha_root, target_size=(8, 12, 16))
    s = ds[0]
    assert s["image"].shape == (8, 12, 16, 5)
    assert s["label"].shape == (8, 12, 16, 1)


def test_non_cubic_resample_axis_order(rng):
    # a volume with a distinctive per-axis gradient must keep its axes
    data = np.zeros((8, 16, 32), dtype=np.float32)
    data += np.arange(8)[:, None, None] * 100      # z gradient
    data += np.arange(16)[None, :, None] * 10      # y gradient
    data += np.arange(32)[None, None, :]           # x gradient
    out = resample_array(data, (4, 8, 16), mode="linear")
    assert out.shape == (4, 8, 16)
    # z still the strongest gradient, x the weakest
    dz = np.abs(np.diff(out, axis=0)).mean()
    dy = np.abs(np.diff(out, axis=1)).mean()
    dx = np.abs(np.diff(out, axis=2)).mean()
    assert dz > dy > dx


def test_validator_with_index_subset(mha_root, tmp_path):
    import jax

    from pcmseg_tpu.core.config import get_config
    from pcmseg_tpu.infer.validate import Validator
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.checkpoints import save_checkpoint
    from pcmseg_tpu.train.steps import create_train_state

    config = get_config(
        "quick", data_dir=mha_root, save_dir=str(tmp_path),
        base_features=4, remat=False, compute_dtype="float32",
        target_size=(20, 20, 20), batch_size=2,
    )
    model = UNet3D.from_config(config)
    state = create_train_state(config, jax.random.key(0), model, (1, 20, 20, 20, 5))
    path = save_checkpoint(str(tmp_path), "best", state, {})

    v = Validator(config, path, indices=[0, 2])
    results = v.validate(save=False)
    assert results["case_count"] == 2
    assert {r["case_id"] for r in results["case_results"]} == {"mcase0", "mcase2"}
