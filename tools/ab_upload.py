"""A/B the VideoDecoder upload strategies in ONE process (one
compile): staged async (device_put in prep thread), unstaged async
(numpy straight into the jitted call), and unstaged synchronous
submit (prep on the caller thread, the pre-async behavior)."""
import os
import sys
import time
from concurrent.futures import Future

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402  (reuses workload + cache env setup)

import jax  # noqa: E402
from openjph_tpu import VideoDecoder, encode  # noqa: E402


def run_once(vd, stream_sets, nburst=6):
    t0 = time.perf_counter()
    vd.submit(stream_sets[0])
    vd.submit(stream_sets[1])
    last = None
    for i in range(nburst - 2):
        last = vd.collect_on_device()
        vd.submit(stream_sets[i % 2])
    while vd.depth:
        last = vd.collect_on_device()
    jax.block_until_ready(last)
    vd.drain_errors()
    return bench.MP * nburst / (time.perf_counter() - t0)


def main():
    frame_sets = bench.make_frames()
    stream_sets = [[encode([f], bit_depth=8, reversible=True,
                           num_decomps=5, block_size=(64, 64))
                    for f in frames] for frames in frame_sets]
    print('encoded', flush=True)
    vd_a = VideoDecoder(to_device=True)
    vd_b = VideoDecoder(to_device=True, stage_uploads=False)
    t0 = time.perf_counter()
    vd_a.submit(stream_sets[0])
    vd_a.collect_on_device()
    vd_a.drain_errors()
    print(f'warmup/compile {time.perf_counter() - t0:.1f}s',
          flush=True)

    def sync_submit(vd, streams):
        f = Future()
        f.set_result(vd._prep_and_dispatch(list(streams)))
        vd._inflight.append(f)

    for r in range(3):
        print(f'-- round {r}', flush=True)
        print('  staged_async   %6.2f MP/s'
              % run_once(vd_a, stream_sets), flush=True)
        print('  unstaged_async %6.2f MP/s'
              % run_once(vd_b, stream_sets), flush=True)
        orig = vd_b.submit
        vd_b.submit = lambda s: sync_submit(vd_b, s)
        print('  unstaged_sync  %6.2f MP/s'
              % run_once(vd_b, stream_sets), flush=True)
        vd_b.submit = orig


if __name__ == '__main__':
    main()
