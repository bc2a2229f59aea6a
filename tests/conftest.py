"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no tests (SURVEY.md §4); this suite is designed from
scratch. Multi-chip sharding is validated with JAX's standard fake-cluster
trick: XLA host-platform device multiplication. Must be set before jax
initializes a backend, hence the env mutation at conftest import time.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_enable_x64', False)
