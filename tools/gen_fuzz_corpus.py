#!/usr/bin/env python
"""Generate the foreign-seed fuzz corpus (fuzzing/seed_corpus/).

The reference fuzzes a committed corpus of externally-produced
codestreams (fuzzing/seed_corpus/,
fuzz_targets/ojph_expand_fuzz_target.cpp:38-120).  Mirroring that,
this tool produces a corpus of ORACLE-ENCODED streams — ojph_compress
run across the config grid (progression orders, odd 33x33 tile
grids, extreme aspect ratios, tiny/rectangular codeblocks,
precincts, tileparts+TLM, qfactor, 16-bit, signed raw, YUV 4:2:0
downsampling, image offsets) — plus a handful of Part-2 exotics the
reference CLI cannot emit (ATK, DFS, NLT type 3, multi-pass HT,
vertical causal) encoded by this package and ADMITTED ONLY IF
ojph_expand decodes them (oracle-validated).

Every corpus stream therefore exercises the decoder with bytes whose
producer is (or is vetted by) the reference implementation, not our
own encoder's dialect.

Usage: python tools/gen_fuzz_corpus.py [--check]
  --check  regenerate into a temp dir and verify the committed corpus
           is complete (same seed names); used by CI.
"""
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

# A sitecustomize-installed TPU PJRT plugin may override jax_platforms
# at interpreter start (beating the env var); force it back so fuzzing
# never runs per-geometry device compiles on a real chip (see
# tests/conftest.py for the same dance).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402

ORACLE_COMPRESS = os.path.join(REPO, '.oracle', 'bin', 'ojph_compress')
ORACLE_EXPAND = os.path.join(REPO, '.oracle', 'bin', 'ojph_expand')
CORPUS = os.path.join(REPO, 'fuzzing', 'seed_corpus')


def _images(tmp):
    """Write the input images once; return name -> (path, meta)."""
    from openjph_tpu.utils.imageio import write_pnm, write_raw, \
        write_tiff, write_yuv
    rng = np.random.RandomState(99)

    def natural(h, w, lo=0, hi=255, t=0):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = (lo + hi) / 2 + (hi - lo) * 0.35 * (
            np.sin(xx / 17.0 + t) * np.cos(yy / 13.0 - t)) \
            + rng.normal(0, (hi - lo) * 0.02, (h, w))
        return np.clip(img, lo, hi).astype(np.int32)

    ims = {}

    def pgm(name, img, maxval=255):
        p = os.path.join(tmp, name + '.pgm')
        write_pnm(p, img, maxval)
        ims[name] = p

    def ppm(name, img):
        p = os.path.join(tmp, name + '.ppm')
        write_pnm(p, img, 255)
        ims[name] = p

    pgm('g64', natural(64, 80))
    pgm('g100', natural(100, 90, t=1))
    pgm('wide', natural(4, 1024, t=2))
    pgm('tall', natural(1024, 4, t=3))
    pgm('g16b', natural(60, 70, 0, 65535, t=4), maxval=65535)
    ppm('rgb', np.stack([natural(48, 52, t=c + 5)
                         for c in range(3)], axis=-1))
    sr = os.path.join(tmp, 'signed.raw')
    write_raw(sr, natural(50, 60, -2000, 2000, t=8), 12, True)
    ims['signed'] = sr
    tif = os.path.join(tmp, 'rgba.tif')
    write_tiff(tif, np.stack([natural(40, 44, t=c + 9)
                              for c in range(4)],
                             axis=-1).astype(np.uint8))
    ims['rgba'] = tif
    # YUV 4:2:0: full-res luma + half-res chroma planes
    y = natural(64, 48, t=12)
    u = natural(32, 24, t=13)
    v = natural(32, 24, t=14)
    yv = os.path.join(tmp, 'c420.yuv')
    write_yuv(yv, [y, u, v], 8)
    ims['c420'] = yv
    return ims


# (seed name, input image key, ojph_compress args)
ORACLE_CONFIGS = [
    ('gray_rev', 'g64', ['-reversible', 'true']),
    ('gray_rev_d2', 'g64', ['-reversible', 'true',
                            '-num_decomps', '2']),
    ('gray_d0', 'g64', ['-reversible', 'true', '-num_decomps', '0']),
    ('gray_d8', 'g100', ['-reversible', 'true', '-num_decomps', '8']),
    ('gray_lossy', 'g64', ['-qstep', '0.01']),
    ('gray_lossy_fine', 'g100', ['-qstep', '0.0002']),
    ('gray_qf85', 'g64', ['-qfactor', '85']),
    ('gray_qf10', 'g100', ['-qfactor', '10']),
    ('rgb_rev', 'rgb', ['-reversible', 'true']),
    ('rgb_rev_noct', 'rgb', ['-reversible', 'true',
                             '-colour_trans', 'false']),
    ('rgb_lossy', 'rgb', ['-qstep', '0.002']),
    ('rgb_qf60', 'rgb', ['-qfactor', '60']),
    ('rgba_rev', 'rgba', ['-reversible', 'true']),
    ('wide_rev', 'wide', ['-reversible', 'true']),
    ('wide_b1024x4', 'wide', ['-reversible', 'true',
                              '-block_size', '{4,1024}']),
    ('tall_rev', 'tall', ['-reversible', 'true']),
    ('blk4', 'g64', ['-reversible', 'true', '-block_size', '{4,4}']),
    ('blk16x64', 'g100', ['-reversible', 'true',
                          '-block_size', '{64,16}']),
    ('blk32x8', 'g100', ['-qstep', '0.01', '-block_size', '{8,32}']),
    ('prec', 'g100', ['-reversible', 'true',
                      '-precincts', '{128,128},{64,64}']),
    ('prec_small', 'g100', ['-qstep', '0.01',
                            '-precincts', '{32,32}']),
    ('off', 'g64', ['-reversible', 'true', '-image_offset', '{3,5}']),
    ('tile32', 'g100', ['-reversible', 'true',
                        '-tile_size', '{32,32}']),
    ('tile33', 'g100', ['-reversible', 'true',
                        '-tile_size', '{33,33}']),
    ('tile33_lossy', 'g100', ['-qstep', '0.01',
                              '-tile_size', '{33,33}']),
    ('tile_off', 'g64', ['-reversible', 'true',
                         '-tile_size', '{40,40}',
                         '-image_offset', '{8,8}',
                         '-tile_offset', '{3,3}']),
    ('tp_r_tlm', 'g100', ['-reversible', 'true',
                          '-tile_size', '{48,48}', '-tileparts', 'R',
                          '-tlm_marker', 'true']),
    ('tp_c', 'rgb', ['-reversible', 'true', '-tileparts', 'C']),
    ('tp_rc', 'rgb', ['-qstep', '0.01', '-tile_size', '{32,32}',
                      '-tileparts', 'RC', '-tlm_marker', 'true']),
    ('g16_rev', 'g16b', ['-reversible', 'true']),
    ('g16_lossy', 'g16b', ['-qstep', '0.25']),
    ('signed12', 'signed',
     ['-reversible', 'true', '-dims', '{60,50}', '-num_comps', '1',
      '-signed', 'true', '-bit_depth', '12', '-downsamp', '{1,1}']),
    ('yuv420', 'c420',
     ['-reversible', 'true', '-dims', '{48,64}', '-num_comps', '3',
      '-signed', 'false,false,false', '-bit_depth', '8',
      '-downsamp', '{1,1},{2,2},{2,2}']),
    ('yuv420_lossy', 'c420',
     ['-qstep', '0.01', '-dims', '{48,64}', '-num_comps', '3',
      '-signed', 'false', '-bit_depth', '8',
      '-downsamp', '{1,1},{2,2}']),
    ('com', 'g64', ['-reversible', 'true', '-com',
                    'fuzz corpus seed']),
    ('rgba_lossy', 'rgba', ['-qstep', '0.005']),
    ('g16_tiles', 'g16b', ['-reversible', 'true',
                           '-tile_size', '{32,32}']),
    ('rgb_prec_pcrl', 'rgb', ['-qstep', '0.01',
                              '-precincts', '{64,64}',
                              '-prog_order', 'PCRL']),
    ('signed12_lossy', 'signed',
     ['-qstep', '0.02', '-dims', '{60,50}', '-num_comps', '1',
      '-signed', 'true', '-bit_depth', '12', '-downsamp', '{1,1}']),
]
# every progression order over the odd multi-tile grid
ORACLE_CONFIGS += [
    (f'po_{po.lower()}', 'g100',
     ['-reversible', 'true', '-tile_size', '{33,33}',
      '-prog_order', po])
    for po in ('LRCP', 'RLCP', 'RPCL', 'PCRL', 'CPRL')]
ORACLE_CONFIGS += [
    (f'po_{po.lower()}_1t', 'g64', ['-qstep', '0.005',
                                    '-prog_order', po])
    for po in ('LRCP', 'PCRL', 'CPRL')]


def _our_exotics():
    """Part-2/extension streams ojph_compress cannot emit, encoded by
    this package; each is admitted only if ojph_expand decodes it."""
    from openjph_tpu import codec, encode
    from openjph_tpu.core import markers as mk
    from openjph_tpu.core.atk import AtkKernel
    from openjph_tpu.core.markers import Dfs
    rng = np.random.RandomState(55)
    img = rng.randint(0, 256, (93, 61)).astype(np.int32)
    simg = rng.randint(-128, 128, (93, 61)).astype(np.int32)
    out = {}

    def siz(w, h, nc=1, bd=8, sgn=False):
        s = mk.Siz()
        s.xsiz, s.ysiz = w, h
        s.comps = [mk.CompInfo(bd, sgn, 1, 1) for _ in range(nc)]
        return s

    # ATK: a 4-step reversible 13/7-like cascade (index >= 2)
    kern = AtkKernel(index=2, reversible=True,
                     steps=((1, 16, 5), (-1, 8, 4), (1, 2, 2),
                            (-1, 1, 1)), coeff_type=0)
    cod = mk.Cod(num_decomps=3, wavelet_kern=kern.index)
    out['atk_custom'] = codec.Encoder(
        siz(61, 93), cod, atks=[kern]).encode([img])
    # DFS: mixed decomposition types, signaled per component via COC
    dfs = Dfs.from_types(0, [Dfs.BIDIR_DWT, Dfs.HORZ_DWT,
                             Dfs.VERT_DWT])
    codd = mk.Cod(num_decomps=3, wavelet_kern=mk.DWT_REV53)
    cocs = {0: mk.Cod(num_decomps=3, wavelet_kern=mk.DWT_REV53,
                      comp_idx=0, dfs_idx=0)}
    out['dfs_bhv'] = codec.Encoder(
        siz(61, 93), codd, cocs=cocs, dfs_list=[dfs]).encode([img])
    # NLT type 3 (binary complement for signed samples)
    out['nlt3_signed'] = codec.Encoder(
        siz(61, 93, sgn=True),
        mk.Cod(num_decomps=3, wavelet_kern=mk.DWT_REV53),
        nlts=[mk.NltSegment(cnlt=0xFFFF, bdnlt=0x87,
                            tnlt=3)]).encode([simg])
    # multi-pass HT (SigProp/MagRef emission) + vertical causal
    sp = img.copy()
    sp[rng.rand(93, 61) < 0.5] = 0
    out['ht3pass'] = encode([sp], reversible=True, num_decomps=2,
                            ht_passes=3)
    out['ht2pass_causal'] = encode([sp], reversible=True,
                                   num_decomps=2, ht_passes=2,
                                   vert_causal=True)
    return out


def generate(dst):
    os.makedirs(dst, exist_ok=True)
    tmp = tempfile.mkdtemp()
    ims = _images(tmp)
    names = []
    for name, imkey, args in ORACLE_CONFIGS:
        j2c = os.path.join(dst, f'{name}.j2c')
        r = subprocess.run(
            [ORACLE_COMPRESS, '-i', ims[imkey], '-o', j2c] + args,
            capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(f'{name}: ojph_compress failed:\n'
                               f'{r.stdout}{r.stderr}')
        names.append(name)
    for name, stream in _our_exotics().items():
        j2c = os.path.join(dst, f'{name}.j2c')
        open(j2c, 'wb').write(stream)
        # oracle validation: the reference must accept the stream
        outf = os.path.join(tmp, 'chk.pgm')
        r = subprocess.run([ORACLE_EXPAND, '-i', j2c, '-o', outf],
                           capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(f'{name}: ojph_expand rejected our '
                               f'stream:\n{r.stdout}{r.stderr}')
        names.append(name)
    return names


def main(argv):
    check = '--check' in argv
    if check:
        dst = tempfile.mkdtemp()
    else:
        dst = CORPUS
    names = generate(dst)
    print(f'{len(names)} seeds -> {dst}')
    assert len(names) >= 50, 'corpus contract: >= 50 seeds'
    if check:
        committed = {f for f in os.listdir(CORPUS)
                     if f.endswith('.j2c')}
        want = {n + '.j2c' for n in names}
        missing = want - committed
        assert not missing, f'corpus out of date, missing: {missing}'
        print('committed corpus complete')
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:]))
