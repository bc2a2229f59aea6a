"""Persistent XLA compilation cache (opt-out).

SD1.5-size programs cost minutes of XLA:TPU compile per process; every CLI
run, bench, and driver compile-check repays it from scratch. JAX's
persistent compilation cache serializes compiled executables to disk keyed
by (HLO, compile options, platform) — verified working over this
environment's remote-TPU ('axon') PJRT plugin AND the CPU backend:
a fresh process re-loads an SD-sized executable in milliseconds.

Enabled by every entry point (bench.py, __graft_entry__, the four CLIs,
tests/conftest.py). Cache location: $MOS_XLA_CACHE (default
/tmp/mos_xla_cache); set MOS_XLA_CACHE=0 to disable. Correctness is
unaffected: the cache key covers the full HLO module, so any code or shape
change recompiles.
"""
import os

__all__ = ['enable_persistent_cache']

_DEFAULT = '/tmp/mos_xla_cache'


def enable_persistent_cache(path: str = None) -> bool:
    """Point JAX at a persistent compilation cache dir. Best-effort:
    returns False (and changes nothing) if disabled or unsupported."""
    path = path or os.environ.get('MOS_XLA_CACHE', _DEFAULT)
    if not path or path == '0':
        return False
    try:
        import jax
        jax.config.update('jax_compilation_cache_dir', path)
        # SD-size programs all compile in >>1s; the default 1s floor also
        # keeps tiny test programs from flooding the dir on CPU.
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        return True
    except Exception:
        return False
