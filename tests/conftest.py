"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no tests (SURVEY.md §4); this suite is designed from
scratch. Multi-chip sharding is validated with JAX's standard fake-cluster
trick: XLA host-platform device multiplication.

Environment quirk: this machine's sitecustomize registers a remote-TPU
('axon') PJRT plugin at interpreter start and selects it via jax config —
env vars set here are too late. Force CPU through jax.config instead, before
any backend is initialized, or every test op round-trips a network tunnel.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

assert jax.devices()[0].platform == 'cpu', 'tests must run on host CPU'
assert len(jax.devices()) == 8, 'expected 8 virtual CPU devices'
