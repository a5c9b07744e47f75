"""Real 2-process multi-host (DCN) run: spawns two worker processes
that jax.distributed-initialize against a localhost coordinator,
decode a frame burst sharded across processes (all-gathered, bit-
exact) AND encode the burst sharded across processes (gathered byte
streams byte-identical to single-process encode)
(parallel/multihost.py)."""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_frame_fanout():
    port = _free_port()
    env = dict(os.environ)
    # the workers initialize their own single-CPU-device runtimes
    env.pop('JAX_NUM_CPU_DEVICES', None)
    env['JAX_PLATFORMS'] = 'cpu'
    procs = [subprocess.Popen(
        [sys.executable, '-m', 'openjph_tpu.parallel.multihost',
         '--coordinator', f'127.0.0.1:{port}',
         '--num-processes', '2', '--process-id', str(pid),
         '--frames', '5'],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out}'
        assert 'multihost OK' in out, out
