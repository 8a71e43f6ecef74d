"""Device-resident dataset cache: equivalence with the streaming loader.

The cached path (data/device_cache.py) gathers batches from HBM-resident
stacks inside the jitted step instead of streaming them host->device.
With augmentation off, its epoch must reproduce the streaming loader's
exactly: same shuffle plan (both derive from config.seed + epoch), same
bf16/uint8 wire values, same step math.
"""

import pytest

# compile-heavy on a 1-core host (measured; see pyproject's marker
# registration) - excluded from the quick lane `pytest -m 'not slow'`
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcmseg_tpu.core.config import get_config
from pcmseg_tpu.data.device_cache import device_augment
from pcmseg_tpu.data.synthetic import make_synthetic_dataset
from pcmseg_tpu.train.trainer import Trainer

SIZE = 16


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dcache_data")
    make_synthetic_dataset(
        str(root), n_cases=5, data_type="BPH", shape=(12, 12, 12)
    )
    return str(root)


def _cfg(data_root, tmp_path, name, **kw):
    return get_config(
        "quick",
        data_dir=data_root,
        save_dir=str(tmp_path / name),
        base_features=4,
        target_size=(SIZE,) * 3,
        batch_size=2,
        num_epochs=1,
        validation=True,
        val_fraction=0.25,
        data_augmentation=False,
        compute_dtype="float32",
        data_parallel=kw.pop("data_parallel", 1),
        donate_state=False,
        **kw,
    )


def test_cached_epoch_matches_streaming(data_root, tmp_path):
    histories = {}
    for name, gb in (("stream", 0.0), ("cached", 1.0)):
        cfg = _cfg(data_root, tmp_path, name, device_data_cache_gb=gb)
        tr = Trainer(cfg)
        if name == "cached":
            assert tr._dcache is not None, "device cache should engage"
            assert tr._dcache["images"].dtype == jnp.bfloat16
        else:
            assert tr._dcache is None
        loss = tr.train_epoch()
        val = tr.validate_epoch()
        histories[name] = (loss, val["loss"], val["dice"])
    s, c = histories["stream"], histories["cached"]
    _assert_epoch_match(c, s)


def _assert_epoch_match(cached, stream):
    """Continuous losses must match to fp tolerance; the THRESHOLDED val
    dice gets a small absolute band — sigmoid(p) > 0.5 is discrete, and
    the cached/streaming programs are differently-fused XLA graphs, so a
    single borderline voxel may flip and move dice by ~1/|mask| (observed:
    3.5e-5 after the round-3 im2col lowering changed fusion) while the
    losses stay bit-identical."""
    np.testing.assert_allclose(cached[:2], stream[:2], rtol=1e-5)
    np.testing.assert_allclose(cached[2], stream[2], atol=1e-3)


def test_cache_respects_budget(data_root, tmp_path):
    cfg = _cfg(data_root, tmp_path, "tiny", device_data_cache_gb=1e-9)
    tr = Trainer(cfg)
    assert tr._dcache is None  # dataset exceeds the (absurdly small) budget


def test_device_augment_shapes_and_determinism():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 4, 6, 6, 3)), jnp.float32)
    lab = jnp.asarray(rng.random((2, 4, 6, 6, 1)) > 0.5, jnp.uint8)
    key = jax.random.key(7)
    a_img, a_lab = device_augment(img, lab, key)
    b_img, b_lab = device_augment(img, lab, key)
    assert a_img.shape == img.shape and a_lab.shape == lab.shape
    np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
    np.testing.assert_array_equal(np.asarray(a_lab), np.asarray(b_lab))
    # labels stay binary under spatial-only augmentation
    assert set(np.unique(np.asarray(a_lab))) <= {0, 1}


def test_device_augment_nonsquare_never_swaps_extents():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(4, 4, 6, 8, 2)), jnp.float32)
    lab = jnp.asarray(rng.random((4, 4, 6, 8, 1)) > 0.5, jnp.uint8)
    for seed in range(5):
        a_img, a_lab = device_augment(
            img, lab, jax.random.key(seed), intensity_jitter=0.0
        )
        assert a_img.shape == img.shape
        assert a_lab.shape == lab.shape


def test_cached_epoch_matches_streaming_sharded(data_root, tmp_path):
    """Sharded mesh: HBM stacks shard over ('data','spatial'), batches are
    gathered inside jit with GSPMD collectives — must reproduce the
    streaming DP run exactly (augmentation off)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    histories = {}
    for name, gb in (("stream", 0.0), ("cached", 1.0)):
        cfg = _cfg(
            data_root,
            tmp_path,
            "sh_" + name,
            device_data_cache_gb=gb,
            data_parallel=2,
            spatial_parallel=2,
        )
        tr = Trainer(cfg)
        assert (tr._dcache is not None) == (name == "cached")
        if name == "cached":
            shard_shapes = {
                s.data.shape for s in tr._dcache["images"].addressable_shards
            }
            n_pad = tr._dcache["images"].shape[0]
            assert all(s[0] < n_pad for s in shard_shapes)  # case axis split
        loss = tr.train_epoch()
        val = tr.validate_epoch()
        histories[name] = (loss, val["loss"], val["dice"])
    _assert_epoch_match(histories["cached"], histories["stream"])
