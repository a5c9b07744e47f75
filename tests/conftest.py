import os
import subprocess
import sys

# Virtual 8-device CPU mesh for sharding tests.  Force-override: the
# ambient environment may point JAX at a (single) real TPU chip, which
# is reserved for bench.py — tests always run on the virtual CPU mesh.
# A sitecustomize-installed TPU PJRT plugin may override jax_platforms
# via jax.config at interpreter start (beating the env var), so the
# config must be forced back programmatically before any backend
# initialization.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('JAX_NUM_CPU_DEVICES', '8')
# Persistent compilation cache: DWT/codec kernels are recompiled per
# (shape, origin) variant; caching across test runs keeps the suite fast.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_test_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')
os.environ.setdefault(
    'JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '-1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices',
                  int(os.environ['JAX_NUM_CPU_DEVICES']))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Address-space pressure relief.  Every XLA:CPU executable JIT-loads
# its fused-computation modules as anonymous r-x/r--/rw- mapping
# triples; this suite compiles enough distinct programs that the
# process walks into vm.max_map_count (65530 here) near the end.
# Past the limit, mmap fails with ENOMEM inside LLVM
# (ContiguousSectionMemoryManager::allocateMappedMemory) and the
# failure path aborts the process — observed as SIGSEGV in
# _Unwind_Backtrace over a half-registered .eh_frame, or SIGABRT
# "LLVM compilation error: Cannot allocate memory".  Freed
# executables DO unmap their sections, so when the map count gets
# high we drop every cached executable (they recompile on next use)
# rather than crash.
import gc  # noqa: E402


def _map_count() -> int:
    try:
        with open('/proc/self/maps') as fh:
            return sum(1 for _ in fh)
    except OSError:  # non-Linux
        return 0


@pytest.fixture(autouse=True)
def _map_pressure_relief():
    yield
    if _map_count() > 35000:
        import jax
        jax.clear_caches()
        gc.collect()

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


if os.environ.get('OJTPU_MEMLOG'):
    # Temporary diagnostics: per-test address-space stats appended to
    # $OJTPU_MEMLOG (map count, VmSize, VmRSS in MB).
    @pytest.fixture(autouse=True)
    def _memlog(request):
        yield
        nmaps = sum(1 for _ in open('/proc/self/maps'))
        vm = rss = 0
        for line in open('/proc/self/status'):
            if line.startswith('VmSize:'):
                vm = int(line.split()[1]) // 1024
            elif line.startswith('VmRSS:'):
                rss = int(line.split()[1]) // 1024
        with open(os.environ['OJTPU_MEMLOG'], 'a') as fh:
            fh.write(f'{nmaps}\t{vm}\t{rss}\t{request.node.nodeid}\n')
