"""Tile-sharded mosaic decode (BASELINE config 5) on the CPU mesh."""
import numpy as np
import pytest

from openjph_tpu import encode
from openjph_tpu.codec import Decoder
from openjph_tpu.parallel.mesh import make_mesh
from openjph_tpu.parallel.tiles import MosaicDecoder, decode_mosaic


@pytest.fixture(scope='module')
def rng():
    return np.random.RandomState(7)


def test_uniform_grid_gray(rng):
    # 16 identical 64x64 tiles -> one geometry class, one dispatch
    img = rng.randint(0, 256, size=(256, 256)).astype(np.int32)
    stream = encode([img], reversible=True, num_decomps=2,
                    tile_size=(64, 64))
    mesh = make_mesh(8)
    md = MosaicDecoder(stream, mesh)
    assert len(md.classes) == 1
    assert len(md.classes[0]['tiles']) == 16
    got = md.decode()
    ref = Decoder(stream).decode()
    assert np.array_equal(got[0], ref[0])


def test_sharded_layout(rng):
    img = rng.randint(0, 256, size=(256, 256)).astype(np.int32)
    stream = encode([img], reversible=True, num_decomps=2,
                    tile_size=(64, 64))
    mesh = make_mesh(8)
    md = MosaicDecoder(stream, mesh)
    (tiles, comps, errs), = md.decode_on_device()
    # decoded tiles are born sharded: the tile axis spans all devices
    assert comps[0].shape[0] >= len(tiles)
    assert len(comps[0].sharding.device_set) == 8
    assert not np.asarray(errs).any()


def test_rim_classes_rgb_mct(rng):
    # 320x256 with 128x128 tiles: 4 interior + 2 right-rim classes
    img = rng.randint(0, 256, size=(256, 320, 3)).astype(np.int32)
    stream = encode(img, reversible=True, num_decomps=2,
                    tile_size=(128, 128), color_transform=True)
    mesh = make_mesh(8)
    md = MosaicDecoder(stream, mesh)
    assert len(md.classes) == 2
    got = md.decode()
    ref = Decoder(stream).decode()
    for c in range(3):
        assert np.array_equal(got[c], ref[c])


def test_irreversible_mosaic(rng):
    from openjph_tpu.tpu.pipeline import TpuDecoder
    img = rng.randint(0, 256, size=(128, 128)).astype(np.int32)
    stream = encode([img], reversible=False, base_delta=0.01,
                    num_decomps=2, tile_size=(64, 64))
    got = decode_mosaic(stream, make_mesh(8))
    # bit-identical to the single-chip fused path; the scalar host
    # decoder may differ by +-1 from float op-ordering
    tpu = TpuDecoder(stream).decode()
    assert np.array_equal(got[0], tpu[0])
    ref = Decoder(stream).decode()
    assert np.abs(got[0].astype(np.int64) - ref[0]).max() <= 1


def test_mosaic_encode_uniform(rng):
    from openjph_tpu.parallel.tiles import encode_mosaic
    img = rng.randint(0, 256, size=(256, 256)).astype(np.int32)
    ref = encode([img], reversible=True, num_decomps=2,
                 tile_size=(64, 64))
    got = encode_mosaic([img], make_mesh(8), reversible=True,
                        num_decomps=2, tile_size=(64, 64))
    assert got == ref   # byte-identical stream, tiles sharded


def test_mosaic_encode_rim_rgb(rng):
    from openjph_tpu.parallel.tiles import encode_mosaic
    img = rng.randint(0, 256, size=(256, 320, 3)).astype(np.int32)
    ref = encode(img, reversible=True, num_decomps=2,
                 tile_size=(128, 128), color_transform=True)
    got = encode_mosaic(img, make_mesh(8), reversible=True,
                        num_decomps=2, tile_size=(128, 128),
                        color_transform=True)
    assert got == ref


def test_mosaic_multipass_mixed_flat_tile(rng):
    """Multipass mosaic where one tile of a geometry class is flat
    (all-zero blocks, no refinement segments): the class-shared
    runner must still get refine-mode packing for every member."""
    from openjph_tpu import encode
    from openjph_tpu.parallel.mesh import make_mesh
    from openjph_tpu.parallel.tiles import decode_mosaic
    img = rng.randint(0, 256, (128, 128)).astype(np.int32)
    img[rng.rand(128, 128) < 0.5] = 0
    img[:64, :64] = 128          # flat tile: zero after the DC offset
    s = encode(img, reversible=True, num_decomps=2,
               tile_size=(64, 64), ht_passes=3)
    out = decode_mosaic(s, make_mesh())
    assert np.array_equal(np.clip(out[0], 0, 255), np.clip(img, 0, 255))
