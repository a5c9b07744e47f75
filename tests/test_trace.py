"""Per-stage tracing (SURVEY.md §5 observability) and message-level
gating (set_message_level, ojph_message.h:47-56)."""
import io
import warnings

import numpy as np
import pytest

import openjph_tpu as oj
from openjph_tpu.core import message as msg
from openjph_tpu.utils import trace


@pytest.fixture(autouse=True)
def _reset():
    yield
    trace.disable()
    trace.reset()
    msg.set_message_level(msg.INFO)
    msg.set_warning_stream(None)


def test_stage_timers_collect_encode_decode():
    trace.enable()
    img = np.random.RandomState(0).randint(0, 256, (80, 96, 1))
    s = oj.encode_tpu(img.astype(np.int32))
    out = oj.decode_tpu(s)
    assert np.array_equal(out[0], img[..., 0])
    st = trace.get_stats()
    assert any(k.startswith('decode.') for k in st)
    assert any(k.startswith('encode.') for k in st)
    for v in st.values():
        assert v['calls'] >= 1 and v['seconds'] >= 0
    rep = trace.report()
    assert 'ms/call' in rep


def test_stage_noop_when_disabled():
    with trace.stage('x'):
        pass
    assert 'x' not in trace.get_stats()


def test_nested_stages():
    trace.enable()
    with trace.stage('outer'):
        with trace.stage('inner'):
            pass
    st = trace.get_stats()
    assert st['outer']['calls'] == 1 and st['inner']['calls'] == 1


def test_message_level_suppresses_warnings():
    msg.set_message_level(msg.ERROR)
    buf = io.StringIO()
    msg.set_warning_stream(buf)
    with warnings.catch_warnings():
        warnings.simplefilter('error')  # any warning would raise
        img = np.zeros((64, 64, 1), np.uint8)
        oj.encode(img, tileparts='C')  # RPCL+C normally warns 0x30021
    assert buf.getvalue() == ''
    # errors still raise at any level
    with pytest.raises(oj.OjphError):
        msg.error(0x1, 'boom')
