"""Data-parallel module tests (virtual 8-device CPU mesh)."""

import jax
import numpy as np

from cape_tpu.parallel.mesh import DATA_AXIS, DataParallel, make_mesh


def test_make_mesh_sizes():
    m_all = make_mesh()
    assert m_all.devices.size == len(jax.devices())
    m2 = make_mesh(2)
    assert m2.devices.size == 2
    assert m2.axis_names == (DATA_AXIS,)


def test_shard_batch_splits_leading_axis():
    dp = DataParallel(8)
    batch = {"a": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    sharded = dp.shard_batch(batch)
    arr = sharded["a"]
    assert arr.shape == (16, 3)
    # 8 shards of 2 rows each
    assert len(arr.addressable_shards) == 8
    assert arr.addressable_shards[0].data.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(arr), batch["a"])


def test_replicate_places_on_all_devices():
    dp = DataParallel(4)
    x = dp.replicate(np.ones((3, 3), np.float32))
    assert len(x.addressable_shards) == 4
    for s in x.addressable_shards:
        assert s.data.shape == (3, 3)


def test_pad_batch_size():
    dp = DataParallel(8)
    assert dp.pad_batch_size(16) == 16
    assert dp.pad_batch_size(17) == 24
    assert dp.pad_batch_size(1) == 8
