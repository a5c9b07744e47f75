"""Burst (frame-batched) encode: VideoEncoder / encode_tpu_batch."""
import numpy as np
import pytest

from openjph_tpu import (VideoEncoder, decode, encode,
                         encode_tpu_batch)


@pytest.fixture(scope='module')
def rng():
    return np.random.RandomState(13)


def test_burst_byte_identical(rng):
    frames = [rng.randint(0, 256, (96, 160, 3)).astype(np.int32)
              for _ in range(8)]
    streams = encode_tpu_batch(frames, reversible=True, num_decomps=3)
    for i, (s, f) in enumerate(zip(streams, frames)):
        assert s == encode(f, reversible=True, num_decomps=3), \
            f'frame {i} differs from the sequential encoder'


def test_bucketed_odd_count(rng):
    frames = [rng.randint(0, 256, (64, 96)).astype(np.int32)
              for _ in range(7)]
    streams = encode_tpu_batch(frames, reversible=True, num_decomps=2)
    assert len(streams) == 7
    for s, f in zip(streams, frames):
        assert np.array_equal(decode(s)[0], f)


def test_pipelined_submit_collect(rng):
    ve = VideoEncoder(reversible=True, num_decomps=2)
    bursts = [[rng.randint(0, 256, (64, 96)).astype(np.int32)
               for _ in range(2)] for _ in range(3)]
    for b in bursts:
        ve.submit(b)
    assert ve.depth == 3
    for b in bursts:
        streams = ve.collect()
        for s, f in zip(streams, b):
            assert np.array_equal(decode(s)[0], f)
    assert ve.depth == 0


def test_multi_tile_frame_falls_back(rng):
    # multi-tile geometry: per-frame path, still correct streams
    frames = [rng.randint(0, 256, (128, 128)).astype(np.int32)
              for _ in range(2)]
    streams = encode_tpu_batch(frames, reversible=True, num_decomps=2,
                               tile_size=(64, 64))
    for s, f in zip(streams, frames):
        assert np.array_equal(decode(s)[0], f)
        assert s == encode(f, reversible=True, num_decomps=2,
                           tile_size=(64, 64))
