"""RTP receiver: packet parsing, reorder window, frame assembly, and a
loopback UDP end-to-end run."""
import socket
import struct
import threading

import numpy as np

from openjph_tpu import decode, encode
from openjph_tpu.apps.stream_expand import (FramesHandler, PacketsHandler,
                                            RtpPacket, serve)


def _make_packet(seq, ts, payload, main=False, marked=False, pos=0):
    hdr = bytearray(20)
    hdr[0] = 0x80  # v2
    hdr[1] = (0x80 if marked else 0) | 96
    struct.pack_into('>H', hdr, 2, seq & 0xFFFF)
    struct.pack_into('>I', hdr, 4, ts)
    struct.pack_into('>I', hdr, 8, 0x1234)
    hdr[12] = (RtpPacket.PT_MAIN_FOLLOWED_BY_BODY if main
               else RtpPacket.PT_BODY) << 6
    hdr[15] = (seq >> 16) & 0xFF
    if not main:
        hdr[16] = (pos >> 4) & 0xFF
        hdr[17] = (pos & 0xF) << 4
    return bytes(hdr) + payload


def _packetize(stream: bytes, ts: int, seq0: int, mtu=1000):
    pkts = []
    seq = seq0
    chunks = [stream[i:i + mtu] for i in range(0, len(stream), mtu)]
    for i, ch in enumerate(chunks):
        last = i == len(chunks) - 1
        pkts.append(_make_packet(seq, ts, ch, main=(i == 0),
                                 marked=last, pos=i))
        seq += 1
    return pkts, seq


def test_rtp_fields():
    p = RtpPacket(_make_packet(0x1F234, 777, b'xyz', main=True,
                               marked=True))
    assert p.valid() and p.seq_num == 0x1F234 and p.time_stamp == 777
    assert p.is_marked and p.packet_type != RtpPacket.PT_BODY
    assert p.payload == b'xyz'


def test_reorder_and_assemble(rng):
    img = rng.randint(0, 256, size=(64, 64)).astype(np.int32)
    stream = encode(img, reversible=True, num_decomps=2)
    got = {}
    frames = FramesHandler(4, lambda ts, d: got.__setitem__(ts, d))
    ph = PacketsHandler(8, frames)
    pkts, _ = _packetize(stream, ts=42, seq0=100, mtu=512)
    order = list(range(len(pkts)))
    rng.shuffle(order)
    for i in order:
        ph.push(RtpPacket(pkts[i]))
    ph.flush()
    assert got and np.array_equal(decode(got[42])[0], img)
    assert ph.get_num_lost_packets() == 0


def test_lost_packet_counting(rng):
    img = rng.randint(0, 256, size=(64, 64)).astype(np.int32)
    stream = encode(img, reversible=True, num_decomps=2)
    got = {}
    frames = FramesHandler(4, lambda ts, d: got.__setitem__(ts, d))
    ph = PacketsHandler(3, frames)
    pkts, _ = _packetize(stream, ts=1, seq0=0, mtu=400)
    assert len(pkts) >= 4
    for i, p in enumerate(pkts):
        if i == 1:
            continue  # drop one packet
        ph.push(RtpPacket(p))
    ph.flush()
    assert ph.get_num_lost_packets() >= 1
    assert frames.trunc_frames + frames.total_frames >= 1


def test_udp_end_to_end(tmp_path, rng):
    imgs = [rng.randint(0, 256, size=(48, 48)).astype(np.int32)
            for _ in range(3)]
    streams = [encode(im, reversible=True, num_decomps=2)
               for im in imgs]
    port = 47311
    target = str(tmp_path / 'frame_%03d')
    result = {}

    def rx():
        result['out'] = serve('127.0.0.1', port, num_threads=2,
                              num_packets=5, quiet=True, target=target,
                              max_frames=len(streams))

    t = threading.Thread(target=rx)
    t.start()
    import time
    time.sleep(0.3)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    seq = 0
    for ts, s in enumerate(streams):
        pkts, seq = _packetize(s, ts=1000 + ts, seq0=seq, mtu=600)
        for p in pkts:
            tx.sendto(p, ('127.0.0.1', port))
            time.sleep(0.002)
    t.join(timeout=20)
    assert not t.is_alive()
    packets, frames = result['out']
    assert frames.total_frames == 3
    for i, im in enumerate(imgs):
        data = open(str(tmp_path / ('frame_%03d' % i)) + '.j2c',
                    'rb').read()
        assert np.array_equal(decode(data)[0], im)
