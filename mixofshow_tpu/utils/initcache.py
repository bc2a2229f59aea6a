"""Pickle cache for host-side random-init parameter trees.

SD1.5-size random init is pure numpy (layers.py init helpers) and should
take seconds, but this host exhibits intermittent multi-second memory
stalls (measured: the same 14.7M-element `rng.random` call ranges
0.05 s – 7.9 s back-to-back), which blow random init of the ~1B-param
model family up to 8+ minutes. Benchmarks and the driver's compile checks
re-init the same deterministic trees every run — cache them on disk once.

Only DETERMINISTIC trees (fixed seed + config) may be cached: the key must
encode both. Results are bit-identical to a fresh init, so cached runs
measure exactly the same compute.
"""
import os
import pickle

__all__ = ['cached_init']

_DIR = os.environ.get('MOS_INIT_CACHE', '/tmp/mos_init_cache')


def cached_init(key: str, builder):
    """Return builder(), memoized on disk under `key` (seed+config-unique)."""
    path = os.path.join(_DIR, f'{key}.pkl')
    try:
        with open(path, 'rb') as f:
            return pickle.load(f)
    except Exception:
        pass
    value = builder()
    try:
        os.makedirs(_DIR, exist_ok=True)
        tmp = f'{path}.{os.getpid()}.tmp'
        with open(tmp, 'wb') as f:
            pickle.dump(value, f, protocol=4)
        os.replace(tmp, path)
    except Exception:
        pass  # cache is best-effort; the value is still correct
    return value
