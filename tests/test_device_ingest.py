"""Device-side serving ingest (config.device_ingest): raw modality
upload + on-chip percentile normalize/cast/stack must match the host C++
fused ingest path to float tolerance (infer/predict.py::_device_ingest_stack
vs data/io-style load_multimodal_images)."""

import os

import numpy as np
import pytest

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def case_dir(tmp_path_factory):
    """A predict-style case dir (one subdir per modality) with int16-ish
    data, one modality missing."""
    import shutil

    tmp = tmp_path_factory.mktemp("ingest")
    root = str(tmp / "tree")
    make_synthetic_dataset(root, n_cases=1, shape=(20, 20, 20), seed=3)
    config = get_config("quick")
    cd = str(tmp / "case000")
    for m in config.modalities[:-1]:  # drop the last modality
        os.makedirs(os.path.join(cd, m))
        shutil.copy(
            os.path.join(root, "BPH-PCA", "BPH", m, "case000.nii.gz"),
            os.path.join(cd, m, "image.nii.gz"),
        )
    return cd


def _predictor(device_ingest: bool, **over):
    import jax

    from pcmseg_tpu.infer.predict import Predictor
    from pcmseg_tpu.models import UNet3D
    from pcmseg_tpu.train.steps import create_train_state

    config = get_config(
        "quick",
        base_features=4,
        target_size=(16, 16, 16),
        compute_dtype="float32",
        remat=False,
        device_ingest=device_ingest,
        **over,
    )
    model = UNet3D.from_config(config)
    state = create_train_state(
        config, jax.random.key(0), model, (1, 16, 16, 16, 5)
    )
    return Predictor(config, preloaded=(model, state))


class TestRawLoader:
    def test_channels_and_reference(self, case_dir):
        from pcmseg_tpu.infer.predict import load_multimodal_raw

        config = get_config("quick")
        channels, ref = load_multimodal_raw(
            case_dir, modalities=config.modalities
        )
        assert len(channels) == 5
        assert channels[-1] is None  # missing -> zero_fill placeholder
        for c in channels[:-1]:
            assert c.shape == ref.shape

    def test_skip_strategy_raises(self, case_dir):
        from pcmseg_tpu.infer.predict import load_multimodal_raw

        config = get_config("quick")
        with pytest.raises(FileNotFoundError):
            load_multimodal_raw(
                case_dir, modalities=config.modalities, handle_missing="skip"
            )


class TestDeviceIngestParity:
    @pytest.mark.parametrize("normalize", ["percentile", "minmax", "zscore"])
    def test_stack_matches_host(self, case_dir, normalize):
        from pcmseg_tpu.infer.predict import (
            load_multimodal_images,
            load_multimodal_raw,
        )

        p = _predictor(True, normalize=normalize)
        channels, _ = load_multimodal_raw(
            case_dir, modalities=p.config.modalities
        )
        dev = np.asarray(p._device_ingest_stack(channels), np.float32)
        host, _ = load_multimodal_images(
            case_dir,
            modalities=p.config.modalities,
            normalize=normalize,
            norm_percentiles=p.config.norm_percentiles,
        )
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, atol=2e-3)
        # the missing channel is zeros on both paths
        assert np.abs(dev[..., -1]).max() == 0

    def test_probs_parity_end_to_end(self, case_dir):
        p_host = _predictor(False)
        p_dev = _predictor(True)
        probs_host, ref_h = p_host.predict_case(case_dir)
        probs_dev, ref_d = p_dev.predict_case(case_dir)
        assert ref_h.shape == ref_d.shape
        np.testing.assert_allclose(
            np.asarray(probs_dev), np.asarray(probs_host), atol=2e-3
        )

    def test_duplicate_strategy_parity(self, case_dir):
        p_host = _predictor(False, missing_strategy="duplicate")
        p_dev = _predictor(True, missing_strategy="duplicate")
        probs_host, _ = p_host.predict_case(case_dir)
        probs_dev, _ = p_dev.predict_case(case_dir)
        np.testing.assert_allclose(
            np.asarray(probs_dev), np.asarray(probs_host), atol=2e-3
        )
