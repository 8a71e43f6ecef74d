"""Connected-component mask postprocessing (infer/postprocess.py).

The reference writes raw thresholded masks (script/predict.py:174-197);
largest-component / min-size filtering is the nnU-Net-style deployment
step built on top. Pure host numpy/scipy — fast, no jit."""

import numpy as np
import pytest

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.infer.postprocess import (
    postprocess_from_config,
    postprocess_mask,
)


def two_blobs(shape=(16, 16, 16), big=5, small=2):
    """Mask with a big cube at the origin corner and a small one at the
    opposite corner (guaranteed disconnected)."""
    m = np.zeros(shape, np.uint8)
    m[:big, :big, :big] = 1
    m[-small:, -small:, -small:] = 1
    return m, big ** 3, small ** 3


def test_largest_cc_keeps_only_the_largest():
    m, big_n, small_n = two_blobs()
    out = postprocess_mask(m, mode="largest_cc")
    assert out.sum() == big_n
    assert out[0, 0, 0] == 1 and out[-1, -1, -1] == 0
    assert out.dtype == np.uint8 and out.shape == m.shape


def test_min_voxels_drops_speckle_keeps_the_rest():
    m, big_n, small_n = two_blobs()
    out = postprocess_mask(m, mode="none", min_voxels=small_n + 1)
    assert out.sum() == big_n
    # threshold below both sizes keeps both
    out = postprocess_mask(m, mode="none", min_voxels=small_n)
    assert out.sum() == big_n + small_n


def test_largest_cc_composes_with_min_voxels():
    m, big_n, _ = two_blobs()
    # min_voxels above even the largest component empties the mask
    out = postprocess_mask(m, mode="largest_cc", min_voxels=big_n + 1)
    assert out.sum() == 0


def test_empty_and_full_masks_pass_through():
    empty = np.zeros((8, 8, 8), np.uint8)
    assert postprocess_mask(empty, mode="largest_cc").sum() == 0
    full = np.ones((8, 8, 8), np.uint8)
    out = postprocess_mask(full, mode="largest_cc")
    assert out.sum() == full.size


def test_face_connectivity_separates_diagonal_voxels():
    m = np.zeros((8, 8, 8), np.uint8)
    m[2, 2, 2] = 1
    m[3, 3, 3] = 1  # corner-adjacent only
    out = postprocess_mask(m, mode="largest_cc", connectivity=1)
    assert out.sum() == 1
    out = postprocess_mask(m, mode="largest_cc", connectivity=3)
    assert out.sum() == 2  # one component under corner adjacency


def test_invalid_mode_raises():
    with pytest.raises(ValueError):
        postprocess_mask(np.zeros((4, 4, 4), np.uint8), mode="bogus")
    with pytest.raises(ValueError):
        get_config("standard", postprocess="bogus")


def test_from_config_identity_and_active():
    m, big_n, small_n = two_blobs()
    cfg_off = get_config("standard")
    assert postprocess_from_config(m, cfg_off).sum() == big_n + small_n
    cfg_on = get_config("standard", postprocess="largest_cc")
    assert postprocess_from_config(m, cfg_on).sum() == big_n
    cfg_min = get_config("standard", min_component_voxels=small_n + 1)
    assert postprocess_from_config(m, cfg_min).sum() == big_n
