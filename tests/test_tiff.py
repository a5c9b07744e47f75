"""TIFF I/O (reference: tif_in/tif_out, common/ojph_img_io.h:436-579)."""
import numpy as np

from openjph_tpu.utils.imageio import read_tiff, write_tiff


def test_tiff_roundtrips(tmp_path, rng):
    for shape, dt in [((10, 13), np.uint8), ((7, 9, 3), np.uint8),
                      ((6, 5), np.uint16), ((4, 8, 3), np.uint16)]:
        img = rng.randint(0, 256 if dt == np.uint8 else 65536,
                          shape).astype(dt)
        p = tmp_path / 'x.tif'
        write_tiff(str(p), img)
        back = read_tiff(str(p))
        assert back.shape == img.shape
        assert np.array_equal(back, img)


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
