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
