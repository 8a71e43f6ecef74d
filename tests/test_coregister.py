"""Physical-space modality co-registration (config.coregister).

The reference stacks independently-resampled modality arrays and silently
assumes voxel-aligned acquisition grids
(/root/reference/script/data_loader.py:352-377); ``resample_to_grid``
(data/resample.py) resamples by physical coordinates instead, and
``coregister=True`` threads it through the dataset and the predict-side
ingest.
"""

import os

import numpy as np
import pytest

from pcmseg_tpu.data.resample import grids_match, resample_to_grid
from pcmseg_tpu.data.volume import Volume


def _smooth(rng, shape):
    """Smooth random volume (trilinear-friendly: no aliasing surprises)."""
    from scipy import ndimage

    return ndimage.gaussian_filter(
        rng.normal(size=shape).astype(np.float32), 2.0
    ).astype(np.float32)


class TestResampleToGrid:
    def test_identity_grid_is_copy(self, rng):
        v = Volume(_smooth(rng, (8, 8, 8)), spacing=(1, 1, 1))
        out = resample_to_grid(v, v)
        np.testing.assert_array_equal(out.data, v.data)
        assert grids_match(out, v)

    def test_origin_shift_realigns(self, rng):
        """A modality whose grid is shifted one voxel along z (physical)
        but holds the same physical content must come back aligned with
        the anchor."""
        a = _smooth(rng, (10, 8, 8))
        anchor = Volume(a, spacing=(1, 1, 1), origin=(0, 0, 0))
        # B's voxel z sits at physical z+1 -> same content means
        # B[z] = A[z+1]
        b = Volume(
            a[1:, :, :].copy(), spacing=(1, 1, 1), origin=(0, 0, 1.0)
        )
        out = resample_to_grid(b, anchor)
        assert out.shape == anchor.shape
        # interior voxels must match A exactly (integer-aligned sampling)
        np.testing.assert_allclose(
            out.data[1:9], a[1:9], atol=1e-5
        )

    def test_spacing_change_interpolates(self, rng):
        """Half-resolution source (2x spacing) upsamples to the anchor
        grid by trilinear interpolation along z."""
        a = _smooth(rng, (9, 6, 6))
        anchor = Volume(a, spacing=(1, 1, 1))
        src = Volume(a[::2].copy(), spacing=(1, 1, 2.0))
        out = resample_to_grid(src, anchor)
        # even z-planes are exact samples; odd are midpoints
        np.testing.assert_allclose(out.data[::2], a[::2], atol=1e-5)
        np.testing.assert_allclose(
            out.data[1:8:2], 0.5 * (a[0:7:2] + a[2:9:2]), atol=1e-5
        )

    def test_nearest_preserves_label_values(self, rng):
        lab = (rng.random((8, 8, 8)) > 0.7).astype(np.uint8)
        src = Volume(lab, spacing=(1, 1, 1), origin=(0.2, -0.3, 0.1))
        anchor = Volume(np.zeros((8, 8, 8), np.float32), spacing=(1, 1, 1))
        out = resample_to_grid(src, anchor, mode="nearest")
        assert out.data.dtype == np.uint8
        assert set(np.unique(out.data)) <= {0, 1}


class TestDatasetCoregister:
    def test_shifted_modality_realigned(self, tmp_path, rng):
        """One modality written on a z-shifted grid: coregister=True
        re-aligns it with the anchor; the parity path (False) keeps the
        index-space mismatch."""
        from pcmseg_tpu.core.config import DEFAULT_MODALITIES
        from pcmseg_tpu.data.dataset import LABEL_DIR, ProstateDataset
        from pcmseg_tpu.data.nifti import write_nifti

        root = str(tmp_path)
        size = (16, 16, 16)
        # high-contrast content: the image wire format is bf16 (~3
        # significant digits), so alignment error must dominate rounding
        a = _smooth(rng, size) * 200.0
        mods = DEFAULT_MODALITIES
        for m in mods:
            os.makedirs(os.path.join(root, "BPH-PCA", "BPH", m))
        os.makedirs(os.path.join(root, "BPH-PCA", LABEL_DIR, "BPH"))
        # anchor (ADC) and 3 aligned modalities hold A on the unit grid
        for m in mods[:4]:
            write_nifti(
                Volume(a, spacing=(1, 1, 1)),
                os.path.join(root, "BPH-PCA", "BPH", m, "c0.nii.gz"),
            )
        # last modality: same physical content on a +2-voxel-z grid
        write_nifti(
            Volume(a[2:].copy(), spacing=(1, 1, 1), origin=(0, 0, 2.0)),
            os.path.join(root, "BPH-PCA", "BPH", mods[4], "c0.nii.gz"),
        )
        write_nifti(
            Volume((a > 10.0).astype(np.uint8), spacing=(1, 1, 1)),
            os.path.join(root, "BPH-PCA", LABEL_DIR, "BPH", "c0.nii.gz"),
        )

        def channel_err(coreg):
            ds = ProstateDataset(
                root, target_size=size, cache_dir=None, coregister=coreg,
                normalize="none",
            )
            s = ds[0]
            img = np.asarray(s["image"], np.float32)
            # compare the shifted modality against the anchor channel on
            # the interior (boundary voxels are extrapolated)
            return float(
                np.abs(img[3:13, :, :, 4] - img[3:13, :, :, 0]).mean()
            )

        err_coreg = channel_err(True)
        err_plain = channel_err(False)
        # coreg error ~ bf16 rounding; plain error ~ real misalignment
        assert err_coreg < 0.1, err_coreg
        assert err_plain > 10 * max(err_coreg, 0.01), (err_plain, err_coreg)
