"""TIFF I/O (reference: tif_in/tif_out, common/ojph_img_io.h:436-579)."""
import numpy as np

from openjph_tpu.utils.imageio import read_tiff, write_tiff


def test_tiff_roundtrips(tmp_path, rng):
    for shape, dt in [((10, 13), np.uint8), ((7, 9, 3), np.uint8),
                      ((6, 5), np.uint16), ((4, 8, 3), np.uint16),
                      ((9, 6, 4), np.uint8), ((5, 7, 4), np.uint16),
                      ((8, 3, 2), np.uint16)]:
        img = rng.randint(0, 256 if dt == np.uint8 else 65536,
                          shape).astype(dt)
        p = tmp_path / 'x.tif'
        write_tiff(str(p), img)
        back = read_tiff(str(p))
        assert back.shape == img.shape
        assert np.array_equal(back, img)


def test_tiff_write_rgba_libtiff_layout(tmp_path, rng):
    """4-channel output must declare BitsPerSample per channel +
    ExtraSamples so libtiff consumers (the reference's tif_in) read
    full-depth samples; PIL doubles as an independent reader."""
    import struct
    img = rng.randint(0, 65536, (6, 5, 4)).astype(np.uint16)
    p = tmp_path / 'rgba.tif'
    write_tiff(str(p), img)
    d = p.read_bytes()
    n = struct.unpack('<H', d[8:10])[0]
    tags = {}
    for i in range(n):
        t, typ, cnt, val = struct.unpack('<HHII', d[10+12*i:22+12*i])
        tags[t] = (typ, cnt, val)
    assert tags[258][1] == 4          # BitsPerSample count == spp
    assert tags[277][2] == 4
    assert 338 in tags                # ExtraSamples present
    assert np.array_equal(read_tiff(str(p)), img)


def test_tiff_big_endian(tmp_path):
    # hand-built big-endian gray 2x2 8-bit
    import struct
    payload = bytes([1, 2, 3, 4])
    entries = [(256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8),
               (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 0),
               (277, 3, 1, 1), (278, 4, 1, 2), (279, 4, 1, 4)]
    strip_off = 8 + 2 + 12 * len(entries) + 4
    out = bytearray(b'MM\x00*' + struct.pack('>I', 8))
    out += struct.pack('>H', len(entries))
    for (t, typ, cnt, val) in entries:
        if t == 273:
            val = strip_off
        if typ == 3 and cnt == 1:
            out += struct.pack('>HHIHH', t, typ, cnt, val, 0)
        else:
            out += struct.pack('>HHII', t, typ, cnt, val)
    out += struct.pack('>I', 0)
    out += payload
    p = tmp_path / 'be.tif'
    p.write_bytes(bytes(out))
    img = read_tiff(str(p))
    assert np.array_equal(img, np.array([[1, 2], [3, 4]], np.uint8))


def _pil():
    try:
        from PIL import Image
        return Image
    except ImportError:  # pragma: no cover
        import pytest
        pytest.skip('PIL unavailable for TIFF interop fixtures')


def test_tiff_compressed_variants(tmp_path, rng):
    """Compression + predictor coverage against an independent
    producer (PIL): the reference reads these through libtiff
    (common/ojph_img_io.h:436-579)."""
    Image = _pil()
    for mode, shape in [('L', (23, 17)), ('RGB', (19, 31, 3))]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        pim = Image.fromarray(img, mode=mode)
        for comp in ('raw', 'packbits', 'tiff_lzw', 'tiff_deflate'):
            p = tmp_path / f'{mode}_{comp}.tif'
            pim.save(str(p), format='TIFF', compression=comp)
            back = read_tiff(str(p))
            assert np.array_equal(back, img), f'{mode} {comp}'


def test_tiff_tiled_and_planar(tmp_path, rng):
    """Hand-built tiled and planar-configuration TIFFs."""
    import struct
    import zlib

    def build(entries_vals, payload_blobs, e='<'):
        entries = sorted(entries_vals)
        n = len(entries)
        blob_base = 8 + 2 + 12 * n + 4
        out_entries = []
        extra = b''
        # place >4-byte values and payloads after the IFD
        cursor = blob_base
        blob_offs = []
        for b in payload_blobs:
            blob_offs.append(cursor)
            extra += b
            cursor += len(b)
        for (t, typ, cnt, val) in entries:
            if isinstance(val, list):
                fmt, sz = {3: ('H', 2), 4: ('I', 4)}[typ]
                raw = struct.pack(e + fmt * cnt, *val)
                if len(raw) <= 4:
                    raw = raw.ljust(4, b'\0')
                    out_entries.append(struct.pack(e + 'HHI', t, typ,
                                                   cnt) + raw)
                else:
                    out_entries.append(struct.pack(e + 'HHII', t, typ,
                                                   cnt, cursor))
                    extra += raw
                    cursor += len(raw)
            else:
                if typ == 3:
                    out_entries.append(struct.pack(e + 'HHIHH', t, typ,
                                                   cnt, val, 0))
                else:
                    out_entries.append(struct.pack(e + 'HHII', t, typ,
                                                   cnt, val))
        hdr = (b'II*\0' if e == '<' else b'MM\0*') \
            + struct.pack(e + 'I', 8)
        body = struct.pack(e + 'H', n) + b''.join(out_entries) \
            + struct.pack(e + 'I', 0)
        return hdr + body + extra, blob_offs

    # --- tiled 8-bit gray, deflate-compressed, 16x16 tiles, 20x25 ---
    h, w, tw, tl = 20, 25, 16, 16
    img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    tiles = []
    for i in range(-(-h // tl)):
        for j in range(-(-w // tw)):
            t = np.zeros((tl, tw), np.uint8)
            blk = img[i * tl:(i + 1) * tl, j * tw:(j + 1) * tw]
            t[:blk.shape[0], :blk.shape[1]] = blk
            tiles.append(zlib.compress(t.tobytes()))
    def tiled_tags(offs):
        return [(256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8),
                (259, 3, 1, 8), (262, 3, 1, 1), (277, 3, 1, 1),
                (322, 4, 1, tw), (323, 4, 1, tl),
                (324, 4, len(tiles), offs),
                (325, 4, len(tiles), [len(t) for t in tiles])]

    # first pass learns the blob offsets, second writes them
    _, offs = build(tiled_tags([0] * len(tiles)), tiles)
    stream, _ = build(tiled_tags(offs), tiles)
    p = tmp_path / 'tiled.tif'
    p.write_bytes(stream)
    assert np.array_equal(read_tiff(str(p)), img)

    # --- planar RGB 16-bit, uncompressed, one strip per plane ---
    h, w = 9, 7
    rgb = rng.randint(0, 65536, (h, w, 3)).astype(np.uint16)
    planes = [rgb[..., c].astype('<u2').tobytes() for c in range(3)]

    def planar_tags(offs):
        return [(256, 4, 1, w), (257, 4, 1, h),
                (258, 3, 3, [16, 16, 16]), (259, 3, 1, 1),
                (262, 3, 1, 2), (277, 3, 1, 3), (278, 4, 1, h),
                (284, 3, 1, 2), (273, 4, 3, offs),
                (279, 4, 3, [len(b) for b in planes])]

    _, offs = build(planar_tags([0, 0, 0]), planes)
    stream, _ = build(planar_tags(offs), planes)
    p = tmp_path / 'planar.tif'
    p.write_bytes(stream)
    assert np.array_equal(read_tiff(str(p)), rgb)


def test_tiff_predictor_rgb(tmp_path, rng):
    """Horizontal predictor (tag 317=2) differences each sample
    against the SAME channel of the previous pixel; chunky RGB must
    not mix channels."""
    Image = _pil()
    img = rng.randint(0, 256, (21, 19, 3)).astype(np.uint8)
    pim = Image.fromarray(img, mode='RGB')
    for comp in ('tiff_lzw', 'tiff_deflate'):
        p = tmp_path / f'pred_{comp}.tif'
        pim.save(str(p), format='TIFF', compression=comp,
                 tiffinfo={317: 2})
        assert np.array_equal(read_tiff(str(p)), img), comp
    gray = rng.randint(0, 65536, (11, 13)).astype(np.uint16)
    pim = Image.fromarray(gray, mode='I;16')
    p = tmp_path / 'pred16.tif'
    pim.save(str(p), format='TIFF', compression='tiff_deflate',
             tiffinfo={317: 2})
    assert np.array_equal(read_tiff(str(p)), gray)
