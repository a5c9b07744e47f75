import os
import subprocess
import sys

# Virtual 8-device CPU mesh for sharding tests; must be set before jax
# import anywhere in the test session.  Force-override: the ambient
# environment may point JAX at a (single) real TPU chip, which is
# reserved for bench.py — tests always run on the virtual CPU mesh.
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORMS'] = 'cpu'
# Persistent compilation cache: DWT/codec kernels are recompiled per
# (shape, origin) variant; caching across test runs keeps the suite fast.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_test_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')
os.environ.setdefault(
    'JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '-1')

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_BIN = os.path.join(REPO, '.oracle', 'bin')


def have_oracle():
    return os.path.exists(os.path.join(ORACLE_BIN, 'ojph_compress'))


requires_oracle = pytest.mark.skipif(
    not have_oracle(), reason='reference OpenJPH binaries not built')


def run_oracle(tool, *args):
    exe = os.path.join(ORACLE_BIN, tool)
    r = subprocess.run([exe] + list(args), capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f'{tool} failed: {r.stdout} {r.stderr}')
    return r.stdout


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
