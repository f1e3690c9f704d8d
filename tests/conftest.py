"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Must set env vars before jax initializes; pytest imports conftest first.
The persistent compilation cache makes repeated runs cheap on the 1-core CI
host.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    flags += ' --xla_force_host_platform_device_count=8'
if '--xla_cpu_collective_timeout_seconds' not in flags:
    # on this 1-core host the 8 virtual replicas reach collectives staggered
    # by their serialized compute; don't let the 40s rendezvous default
    # abort mesh tests
    flags += (' --xla_cpu_collective_timeout_seconds=3600'
              ' --xla_cpu_collective_call_terminate_timeout_seconds=3600')
os.environ['XLA_FLAGS'] = flags.strip()
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_kgdet'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax  # noqa: E402

# The environment's sitecustomize registers an 'axon' TPU backend and forces
# jax_platforms='axon,cpu' via jax.config (overriding the env var), so setting
# JAX_PLATFORMS alone is not enough — re-force CPU before backends initialize.
jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def demo_ann_file():
    path = '/root/reference/data/demo_dataset/demo_dataset-32.json'
    if not os.path.exists(path):
        pytest.skip('demo dataset fixture not available')
    return path
