import os
import subprocess
import sys

# Virtual 8-device CPU mesh for sharding tests; must be set before jax
# import anywhere in the test session.
os.environ.setdefault('XLA_FLAGS',
                      '--xla_force_host_platform_device_count=8')
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

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
