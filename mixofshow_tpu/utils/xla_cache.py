"""Persistent XLA compilation cache (opt-out).

SD1.5-size programs cost minutes of XLA:TPU compile per process; every CLI
run, bench, and driver compile-check repays it from scratch. JAX's
persistent compilation cache serializes compiled executables to disk keyed
by (HLO, compile options, platform) — verified working over this
environment's remote-TPU ('axon') PJRT plugin AND the CPU backend:
a fresh process re-loads an SD-sized executable in milliseconds.

Enabled from ``mixofshow_tpu/__init__.py``, hence active for every entry
point that imports the package (bench.py, __graft_entry__, the four CLIs,
tests). Cache location: $MOS_XLA_CACHE (default: `.xla_cache/` at the repo
root when running from a writable source checkout — it survives
container/host recycling with the checkout — else a per-user dir under the
system tempdir); set MOS_XLA_CACHE=0 to disable. An explicit user/env JAX
cache configuration (jax_compilation_cache_dir already set, e.g. via
JAX_COMPILATION_CACHE_DIR) always wins — the package default is skipped.
Correctness is unaffected: the cache key covers the full HLO module, so any
code or shape change recompiles.
"""
import logging
import os
import tempfile

__all__ = ['enable_persistent_cache']

logger = logging.getLogger(__name__)


def _default_dir() -> str:
    # Prefer a repo-local cache when running from a source checkout: the
    # system tempdir does not survive container/host recycling, so the
    # driver's bench run always repaid SD-size cold compiles (the round-4
    # shrunk fusion compose measured 704 s cold through the remote compile
    # service vs ~seconds warm). A dir next to the package travels with the
    # checkout and is .gitignore'd. Falls back to a per-user tempdir path
    # when the checkout is read-only or the package is installed
    # site-packages (where writing a sibling dir would be rude).
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))  # …/mixofshow_tpu/utils/ -> repo root
    repo_cache = os.path.join(pkg_root, '.xla_cache')
    if ('site-packages' not in pkg_root and 'dist-packages' not in pkg_root
            and os.access(pkg_root, os.W_OK)):
        return repo_cache
    # Per-user tempdir path: a world-shared fixed /tmp name invites
    # permission failures and cache poisoning on multi-user hosts.
    try:
        uid = f'_{os.getuid()}'
    except AttributeError:  # non-POSIX
        uid = ''
    return os.path.join(tempfile.gettempdir(), f'mos_xla_cache{uid}')


def enable_persistent_cache(path: str = None) -> bool:
    """Point JAX at a persistent compilation cache dir. Best-effort:
    returns False (and changes nothing) if disabled, unsupported, or if the
    user already configured a JAX compilation cache themselves."""
    path = path or os.environ.get('MOS_XLA_CACHE') or _default_dir()
    if not path or path == '0':
        return False
    try:
        import jax

        # An explicit user configuration (jax.config call or
        # JAX_COMPILATION_CACHE_DIR env) wins over the package default.
        if getattr(jax.config, 'jax_compilation_cache_dir', None):
            return True
        jax.config.update('jax_compilation_cache_dir', path)
        # On the remote-TPU ('axon') backend EVERY compile — even a trivial
        # eager op — pays a ~0.5 s round trip through the remote compile
        # service, and the fusion compose dispatches dozens of unique tiny
        # eager ops per process; with the default 1 s floor those are never
        # persisted, so every compose repaid ~65 such compiles (measured,
        # r4). Persist everything on accelerator backends. On CPU keep the
        # 1 s floor: eager ops compile in ms there and would flood the dir
        # with thousands of KB-size entries (the pytest suite forces
        # JAX_PLATFORMS=cpu). We must not query jax.default_backend() here —
        # this runs at package import, and initializing the backend that
        # early would break callers that set XLA flags afterwards (e.g.
        # __graft_entry__.dryrun_multichip's host-device-count forcing). So
        # the 0.0 floor applies only when JAX_PLATFORMS *explicitly* names a
        # non-CPU platform; unset (where JAX may silently fall back to CPU)
        # keeps the conservative 1 s floor (ADVICE r4).
        platforms = os.environ.get('JAX_PLATFORMS', '').lower()
        explicit_accel = bool(platforms) and 'cpu' not in platforms
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          0.0 if explicit_accel else 1.0)
        return True
    except Exception as e:
        # Breadcrumb: a silent failure here means every run silently repays
        # the 10-25 min compile.
        logger.warning('persistent XLA cache not enabled (%s: %s)',
                       type(e).__name__, e)
        return False
