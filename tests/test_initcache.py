"""Disk cache for deterministic init trees (utils/initcache.py)."""
import numpy as np
import jax.numpy as jnp
import ml_dtypes
import pytest

from mixofshow_tpu.utils import initcache


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(initcache, '_DIR', str(tmp_path))
    return tmp_path


def test_memoizes_and_roundtrips_bf16(cache_dir):
    calls = []

    def build():
        calls.append(1)
        return {'a': np.arange(6, dtype=np.float32).reshape(2, 3),
                'b': [np.asarray([1.5, -2.25], ml_dtypes.bfloat16)],
                'n': 3}

    a = initcache.cached_init('k1', build)
    b = initcache.cached_init('k1', lambda: 1 / 0)  # must not be called
    assert len(calls) == 1
    np.testing.assert_array_equal(a['a'], b['a'])
    # bf16 leaves survive the uint16-view packing bit-exactly, dtype intact
    assert b['b'][0].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(a['b'][0].view(np.uint16),
                                  b['b'][0].view(np.uint16))
    assert b['n'] == 3


def test_distinct_keys_do_not_collide(cache_dir):
    assert initcache.cached_init('x', lambda: 1) == 1
    assert initcache.cached_init('y', lambda: 2) == 2
    assert initcache.cached_init('x', lambda: 3) == 1
