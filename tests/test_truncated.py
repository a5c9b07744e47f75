"""Truncated-codestream decode contract, ported from the reference's
tests/test_truncated_decode.cpp:87-236: cut an encoded stream at 16
lengths; resilient mode never raises and always returns FULL-SIZE
frames; strict mode reports detected truncations by raising (our
sanctioned exception types), and any cut strict mode detects must
still decode full-size under resilience — the flag, and only the
flag, decides."""
import numpy as np
import pytest

from openjph_tpu import decode, decode_tpu, encode
from openjph_tpu.core import message as msg

W = H = 256
NUM_CUTS = 16


@pytest.fixture(scope='module')
def full_stream():
    # detailed enough that a reversible stream spans many packets, so
    # cuts land in tile data rather than the main header
    # (test_truncated_decode.cpp:73-76, 106-112)
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    img = ((x * 7 + y * 13 + ((x * y) >> 3)) & 0xFF).astype(np.int32)
    s = encode(img, reversible=True, num_decomps=5, block_size=(64, 64))
    assert len(s) > NUM_CUTS * 64
    return img, s


@pytest.fixture(autouse=True)
def _quiet():
    # a truncated codestream is expected to be noisy; these tests are
    # about the return path (test_truncated_decode.cpp:161)
    old = msg._level
    msg.set_message_level(msg.NO_MSG)
    yield
    msg._level = old


def _decode_shape(data, resilient, tpu=False):
    fn = decode_tpu if tpu else decode
    planes = fn(data, resilient=resilient)
    return planes[0].shape


@pytest.mark.parametrize('tpu', [False, True])
def test_complete_codestream_decodes_in_both_modes(full_stream, tpu):
    img, s = full_stream
    fn = decode_tpu if tpu else decode
    assert np.array_equal(fn(s, resilient=False)[0], img)
    assert np.array_equal(fn(s, resilient=True)[0], img)


@pytest.mark.parametrize('tpu', [False, True])
def test_resilient_mode_decodes_every_truncation_length(full_stream,
                                                        tpu):
    _, s = full_stream
    for cut in range(1, NUM_CUTS):
        part = s[:len(s) * cut // NUM_CUTS]
        shape = _decode_shape(part, resilient=True, tpu=tpu)
        assert shape == (H, W), \
            f'truncated to {len(part)} of {len(s)} bytes'


@pytest.mark.parametrize('tpu', [False, True])
def test_strict_mode_raises_on_detected_truncation(full_stream, tpu):
    _, s = full_stream
    num_detected = 0
    for cut in range(1, NUM_CUTS):
        part = s[:len(s) * cut // NUM_CUTS]
        try:
            shape = _decode_shape(part, resilient=False, tpu=tpu)
        except (ValueError, EOFError):
            # detected: the same input with resilience enabled must
            # decode full-size instead of raising
            num_detected += 1
            assert _decode_shape(part, resilient=True, tpu=tpu) \
                == (H, W), \
                f'truncated to {len(part)} of {len(s)} bytes'
        else:
            # cuts inside codeblock data are undetectable; they must
            # still return a full-size frame
            assert shape == (H, W)
    # every cut before the last tile part chops structure the strict
    # parser can see; at least the early ones must be detected
    assert num_detected > 0


def test_resilient_truncation_stays_on_fused_path(full_stream):
    """Round-5 contract: resilient decode runs through the FUSED
    runner (the reference serves resilience in its one full-speed
    path, ojph_codestream_local.cpp:903-950) — the planner deadens
    broken lanes instead of bailing, and the fused output matches the
    host decoder on every cut (modulo the fused path's documented
    nominal-range clip)."""
    import numpy as np
    from openjph_tpu.tpu.pipeline import TpuDecoder, _build_plan
    _, s = full_stream
    fused = 0
    for cut in range(1, NUM_CUTS):
        part = s[:len(s) * cut // NUM_CUTS]
        d = TpuDecoder(part, resilient=True)
        plan = _build_plan(d)
        if plan is None:
            continue  # corrupt parse pushed it to the slow path: ok
        fused += 1
        out_f = d._decode_fast(plan)[0]
        out_h = decode(part, resilient=True)[0]
        assert out_f.shape == (H, W)
        assert np.array_equal(out_f.astype(np.int64),
                              np.clip(out_h, 0, 255)), cut
    # the truncation cuts must predominantly stay fused
    assert fused >= NUM_CUTS - 4


def test_resilient_zeroes_corrupt_block_on_fused_path(full_stream):
    """Byte corruption INSIDE a codeblock segment (valid lengths, bad
    content): strict raises from the fused error flags; resilient
    decodes the frame with the broken block zeroed in-graph
    (ojph_codeblock.cpp:214-225)."""
    import numpy as np
    from openjph_tpu.tpu.pipeline import TpuDecoder, _build_plan
    img, s = full_stream
    # flip bytes mid-stream until strict detects a Tier-1 error but
    # the Tier-2 parse stays intact (plan exists both modes)
    for off in range(len(s) * 3 // 4, len(s) - 64, 97):
        bad = bytearray(s)
        for j in range(8):
            bad[off + j] ^= 0xA5
        bad = bytes(bad)
        try:
            strict = TpuDecoder(bad)
            plan = _build_plan(strict)
            if plan is None:
                continue
            strict._decode_fast(plan)
        except (ValueError, EOFError):
            res = TpuDecoder(bad, resilient=True)
            rplan = _build_plan(res)
            if rplan is None:
                continue
            out = res._decode_fast(rplan)[0]
            assert out.shape == (H, W)
            return  # found a corruption the contract covers
    pytest.skip('no byte flip produced a fused-path Tier-1 error')


def test_mosaic_decoder_accepts_resilient():
    """MosaicDecoder no longer refuses resilient streams; a corrupt
    tile decodes as zeros instead of raising."""
    import numpy as np
    from openjph_tpu.parallel.tiles import MosaicDecoder
    x = np.arange(128)[None, :]
    y = np.arange(128)[:, None]
    img = ((x * 5 + y * 9) & 0xFF).astype(np.int32)
    s = encode(img, reversible=True, num_decomps=2,
               tile_size=(64, 64), block_size=(32, 32))
    md = MosaicDecoder(s, resilient=True)
    out = md.decode()
    assert np.array_equal(out[0], img)
    # truncated: still decodes full-size without raising
    part = s[:len(s) * 3 // 4]
    md2 = MosaicDecoder(part, resilient=True)
    out2 = md2.decode()
    assert out2[0].shape == (128, 128)
