"""Multi-host (DCN) frame fan-out: `jax.distributed` scaffolding.

The reference's only distributed component fans frames out to worker
threads on one host (ojph_stream_expand's packets/frames handlers +
thread pool).  The TPU-native equivalent distributes FRAMES across
hosts: frames are independent codestreams, so the data-parallel axis
rides DCN with no inter-host collectives on the decode path itself —
DCN carries control and (optionally) gathered results, exactly like
the reference's socket -> worker handoff.

Topology: every process calls :func:`init` (jax.distributed), then
:func:`decode_frames` — each process decodes its round-robin share of
the burst locally (on its local devices via the fused TpuDecoder
path) and the per-frame results are exchanged with a global
all-gather so every process returns the FULL burst, bit-exact — or
:func:`encode_frames`, the encode-direction mirror (pixel frames fan
out, the small coded byte streams gather back, byte-identical to a
single-process encode).

Tested by a real 2-process localhost run (tests/test_multihost.py)
and by `__graft_entry__.dryrun_multichip` stage 5.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def init(coordinator_address: str, num_processes: int,
         process_id: int, local_device_count: Optional[int] = None,
         platform: Optional[str] = None) -> None:
    """Initialize this process's slot in the multi-host runtime.

    Call before any other JAX use in the process.  ``platform='cpu'``
    with ``local_device_count=1`` gives the standard multi-process-
    on-one-host test topology; on real pods the TPU runtime supplies
    both and the arguments are forwarded as-is."""
    import jax
    if platform:
        jax.config.update('jax_platforms', platform)
    if local_device_count and (platform or 'cpu') == 'cpu':
        jax.config.update('jax_num_cpu_devices', local_device_count)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def _gather_bytes(blobs: List[bytes]):
    """All-gather variable-length byte strings across processes:
    lengths first, then one padded uint8 all-gather."""
    from jax.experimental import multihost_utils
    lens = np.array([len(b) for b in blobs], np.int64)
    all_lens = multihost_utils.process_allgather(lens)
    m = int(all_lens.max()) if all_lens.size else 1
    pad = np.zeros((len(blobs), max(m, 1)), np.uint8)
    for i, b in enumerate(blobs):
        pad[i, :len(b)] = np.frombuffer(b, np.uint8)
    allb = multihost_utils.process_allgather(pad)
    return all_lens, allb


def decode_frames(streams: List[bytes], skip_res: int = 0,
                  gather: bool = True) -> List[List[np.ndarray]]:
    """Decode a burst of frames sharded across processes over DCN.

    Process p decodes ``streams[p::num_processes]`` locally (fused
    TPU path); with ``gather`` the decoded planes are all-gathered so
    every process returns the complete, ordered burst.  With
    ``gather=False`` the non-local entries are ``None`` (pure fan-out:
    results stay where they were produced, the stream_expand storer
    pattern)."""
    import jax
    from jax.experimental import multihost_utils
    from ..tpu.pipeline import decode_tpu_batch
    nproc = jax.process_count()
    pid = jax.process_index()
    mine = list(range(pid, len(streams), nproc))
    local = decode_tpu_batch([streams[i] for i in mine],
                             skip_res=skip_res) if mine else []
    results: List[Optional[list]] = [None] * len(streams)
    for i, planes in zip(mine, local):
        results[i] = planes
    if not gather or nproc == 1:
        return results
    # exchange per-frame planes: serialize each frame's planes into a
    # flat npz-free blob (dtype/shape header + raw bytes), all-gather
    blobs = []
    for i in range(len(streams)):
        if results[i] is None:
            blobs.append(b'')
            continue
        parts = []
        for p in results[i]:
            p = np.ascontiguousarray(p)
            hdr = ('%s:%s;' % (p.dtype.str,
                               ','.join(map(str, p.shape)))).encode()
            parts.append(np.uint32(len(hdr)).tobytes() + hdr
                         + p.tobytes())
        blobs.append(np.uint32(len(results[i])).tobytes()
                     + b''.join(parts))
    all_lens, allb = _gather_bytes(blobs)
    # allb: [nproc, nframes, m]
    for i in range(len(streams)):
        if results[i] is not None:
            continue
        owner = i % nproc
        raw = bytes(allb[owner, i, :all_lens[owner, i]])
        nplanes = int(np.frombuffer(raw[:4], np.uint32)[0])
        off = 4
        planes = []
        for _ in range(nplanes):
            hl = int(np.frombuffer(raw[off:off + 4], np.uint32)[0])
            off += 4
            hdr = raw[off:off + hl].decode()
            off += hl
            dt, shp = hdr[:-1].split(':')
            shape = tuple(int(v) for v in shp.split(','))
            n = int(np.prod(shape)) * np.dtype(dt).itemsize
            planes.append(np.frombuffer(raw[off:off + n], dt)
                          .reshape(shape))
            off += n
        results[i] = planes
    multihost_utils.sync_global_devices('ojtpu_decode_frames')
    return results


def encode_frames(frames, gather: bool = True,
                  **enc_kwargs) -> List[Optional[bytes]]:
    """Encode a burst of frames sharded across processes over DCN —
    the encode-direction mirror of :func:`decode_frames` (the
    reference's worker fan-out, ojph_stream_expand/, inverted:
    sources fan IN to codestreams).

    Process p encodes ``frames[p::num_processes]`` locally (fused
    TpuEncoder path, batched bursts); with ``gather`` the byte
    streams — small next to pixel planes, so the all-gather rides
    DCN cheaply — are exchanged so every process returns the
    complete, ordered burst, byte-identical to a single-process
    encode.  With ``gather=False`` non-local entries are ``None``
    (results stay on their producer)."""
    import jax
    from jax.experimental import multihost_utils
    from ..tpu.encode_pipeline import encode_tpu_batch
    nproc = jax.process_count()
    pid = jax.process_index()
    mine = list(range(pid, len(frames), nproc))
    local = encode_tpu_batch([frames[i] for i in mine],
                             **enc_kwargs) if mine else []
    results: List[Optional[bytes]] = [None] * len(frames)
    for i, s in zip(mine, local):
        results[i] = s
    if not gather or nproc == 1:
        return results
    blobs = [r if r is not None else b'' for r in results]
    all_lens, allb = _gather_bytes(blobs)
    for i in range(len(frames)):
        if results[i] is None:
            owner = i % nproc
            results[i] = bytes(allb[owner, i, :all_lens[owner, i]])
    multihost_utils.sync_global_devices('ojtpu_encode_frames')
    return results


def _worker_main(argv=None) -> int:
    """CLI worker for multi-process launches (and the self-test):

    python -m openjph_tpu.parallel.multihost --coordinator H:P \
        --num-processes N --process-id K --frames F [--size WxH]

    Encodes F deterministic frames (every process builds the same
    streams), decodes them sharded across the N processes, verifies
    the gathered burst bit-exact against the source, prints OK."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--coordinator', required=True)
    ap.add_argument('--num-processes', type=int, required=True)
    ap.add_argument('--process-id', type=int, required=True)
    ap.add_argument('--frames', type=int, default=4)
    ap.add_argument('--size', default='96x64')
    ap.add_argument('--platform', default='cpu')
    args = ap.parse_args(argv)
    init(args.coordinator, args.num_processes, args.process_id,
         local_device_count=1, platform=args.platform)
    w, h = (int(v) for v in args.size.split('x'))
    from ..codec import encode
    rng = np.random.RandomState(7)
    frames = [((np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5
                + t * 17) % 254 + rng.randint(0, 2, (h, w)))
              .astype(np.int32) for t in range(args.frames)]
    streams = [encode([f], reversible=True, num_decomps=2)
               for f in frames]
    results = decode_frames(streams)
    for t, (f, planes) in enumerate(zip(frames, results)):
        assert planes is not None, f'frame {t} missing after gather'
        assert np.array_equal(planes[0], f), f'frame {t} mismatch'
    # encode direction: burst sharded across processes must gather
    # byte-identical to the single-process streams
    enc_streams = encode_frames(frames, reversible=True,
                                num_decomps=2)
    for t, (s, e) in enumerate(zip(streams, enc_streams)):
        assert e == s, f'frame {t} encode not byte-identical'
    print('multihost OK process %d/%d: %d frames bit-exact '
          'decode + byte-identical encode'
          % (args.process_id, args.num_processes, args.frames),
          flush=True)
    return 0


if __name__ == '__main__':
    import sys
    sys.exit(_worker_main())
