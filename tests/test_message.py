"""Coded messaging: stable hex codes, pluggable sinks, handler config.

Mirrors the reference's messaging architecture
(ojph_message.h:60-292): INFO/WARNING/ERROR levels, each routable to a
stream or a user handler, with errors always terminating.  Codes for
checks that exist in the reference reuse the reference's exact code
(e.g. 0x00050064 for a missing Pcap^15, ojph_params.cpp:1004-1007).
"""
import io
import warnings

import pytest

import openjph_tpu as oj
from openjph_tpu.core import markers as mk
from openjph_tpu.core import message as msg


@pytest.fixture(autouse=True)
def _reset_sinks():
    yield
    msg.set_info_stream(None)
    msg.set_warning_stream(None)
    msg.set_error_stream(None)
    msg.configure_info(None)
    msg.configure_warning(None)
    msg.configure_error(None)


def _encode_gray(**kw):
    import numpy as np
    img = (np.arange(64 * 64, dtype=np.uint8).reshape(64, 64) & 0xFF)
    return oj.encode(img[..., None], **kw)


def test_error_carries_code_and_is_valueerror():
    with pytest.raises(ValueError) as ei:
        mk.Cap.from_bytes(b'\x00\x00\x00\x00')  # Pcap^15 missing
    assert isinstance(ei.value, oj.OjphError)
    assert ei.value.code == 0x00050064  # ojph_params.cpp:1004-1007


def test_qfactor_range_code():
    with pytest.raises(oj.OjphError) as ei:
        _encode_gray(reversible=False, qfactor=0)
    assert ei.value.code == 0x00050181  # ojph_params.cpp qfactor check


def test_profile_error_code():
    import numpy as np
    img = np.zeros((64, 64, 1), np.uint8)
    with pytest.raises(oj.OjphError) as ei:
        # default progression is not CPRL -> IMF progression check
        oj.encode(img, profile='IMF')
    # one of the IMF codes 0x000300C1..CD
    assert 0x000300C1 <= ei.value.code <= 0x000300CD


def test_error_stream_sink():
    buf = io.StringIO()
    msg.set_error_stream(buf)
    with pytest.raises(oj.OjphError):
        mk.Cap.from_bytes(b'\x00\x00\x00\x00')
    out = buf.getvalue()
    assert 'ojph error 0x00050064' in out
    assert 'markers.py' in out


def test_error_handler_called_then_raises():
    seen = []
    msg.configure_error(lambda code, f, l, m: seen.append((code, m)))
    with pytest.raises(oj.OjphError):
        mk.Cap.from_bytes(b'\x00\x00\x00\x00')
    assert seen and seen[0][0] == 0x00050064


def test_warning_goes_through_warnings_module():
    with pytest.warns(oj.OjphWarning, match=r'0x00030021'):
        # RPCL + component tile-part divisions: divisions are dropped
        # with warning 0x00030021 (ojph_codestream_local.cpp)
        _encode_gray(tileparts='C')


def test_warning_stream_sink():
    buf = io.StringIO()
    msg.set_warning_stream(buf)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        _encode_gray(tileparts='C')
    assert 'ojph warning 0x00030021' in buf.getvalue()


def test_info_stream():
    buf = io.StringIO()
    msg.set_info_stream(buf)
    msg.info(0x00010001, 'hello')
    assert 'ojph info 0x00010001' in buf.getvalue()


def test_resilient_decode_still_works_with_coded_errors():
    import numpy as np
    img = np.zeros((64, 64, 1), np.uint8)
    bs = bytearray(oj.encode(img))
    bs[60] ^= 0xFF  # corrupt something mid-stream
    try:
        oj.decode(bytes(bs), resilient=True)
    except (ValueError, EOFError):
        pass  # resilience is best-effort; no other exception types


def test_multilayer_stream_rejected():
    """>1 quality layer must raise the reference's coded error at COD
    read time (ojph_codestream_local.cpp:794-798) instead of silently
    misparsing packet headers."""
    import numpy as np
    from openjph_tpu.core.message import OjphError
    img = np.zeros((32, 32), np.int32)
    bs = bytearray(oj.encode(img, reversible=True))
    i = bs.find(b'\xff\x52')  # COD: marker,Lcod,Scod,prog,layers(u16)
    assert i > 0 and bs[i + 6:i + 8] == b'\x00\x01'
    bs[i + 6:i + 8] = (512).to_bytes(2, 'big')
    with pytest.raises(OjphError) as ei:
        oj.decode(bytes(bs))
    assert ei.value.code == 0x00030053
    bs[i + 6:i + 8] = (2).to_bytes(2, 'big')
    with pytest.raises(OjphError) as ei:
        oj.decode(bytes(bs))
    assert ei.value.code == 0x00030053
