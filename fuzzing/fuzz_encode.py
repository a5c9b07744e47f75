#!/usr/bin/env python
"""Encode fuzzer (the reference's libFuzzer encode-target analogue,
fuzzing/fuzz_targets/ojph_compress_fuzz_target.cpp).

Strategy: throw randomized parameter combinations and random/adversarial
sample planes at the encoder.  The contract under fuzz: encode() either
returns a well-formed codestream or raises a typed OjphError/ValueError
(never crashes/hangs); every returned reversible stream decodes
bit-exact to its input; irreversible streams decode without error; and
(when the oracle binaries are present) ojph_expand exits 0 on a random
subset of our streams — third-party decodability.

Work-explosion guards mirror the reference's (bounded samples,
decompositions, components).

Usage: python fuzzing/fuzz_encode.py [iterations] [seed]
"""
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

# A sitecustomize-installed TPU PJRT plugin may override jax_platforms
# at interpreter start (beating the env var); force it back so fuzzing
# never runs per-geometry device compiles on a real chip (see
# tests/conftest.py for the same dance).
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402

ORACLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.oracle', 'bin', 'ojph_expand')


def random_params(rng):
    """One randomized encode() kwarg set + matching image planes."""
    h = int(rng.randint(1, 180))
    w = int(rng.randint(1, 180))
    nc = int(rng.choice([1, 1, 1, 3, 3, 4]))
    bd = int(rng.choice([1, 2, 4, 8, 8, 10, 12, 16]))
    sgn = bool(rng.randint(0, 2))
    kw = dict(bit_depth=bd, is_signed=sgn,
              reversible=bool(rng.randint(0, 2)),
              num_decomps=int(rng.randint(0, 7)),
              prog_order=int(rng.randint(0, 5)))
    if not kw['reversible']:
        kw['base_delta'] = float(rng.choice(
            [1 / 4096, 1 / 256, 1 / 64, 0.05]))
    bs = 1 << rng.randint(2, 7)
    kw['block_size'] = (bs, bs)
    if rng.randint(0, 3) == 0:
        ts = (int(rng.randint(8, 128)), int(rng.randint(8, 128)))
        kw['tile_size'] = ts
    if rng.randint(0, 4) == 0:
        p = 1 << rng.randint(5, 9)
        kw['precincts'] = [(p, p)]
    if rng.randint(0, 4) == 0:
        kw['tlm_marker'] = True
    if rng.randint(0, 5) == 0:
        kw['tileparts'] = str(rng.choice(['R', 'C', 'RC']))
    lo = -(1 << (bd - 1)) if sgn else 0
    hi = (1 << (bd - 1)) if sgn else (1 << bd)
    kind = rng.randint(0, 4)
    if kind == 0:
        planes = [rng.randint(lo, hi, (h, w)).astype(np.int32)
                  for _ in range(nc)]
    elif kind == 1:     # constant extremes
        planes = [np.full((h, w), rng.choice([lo, hi - 1]), np.int32)
                  for _ in range(nc)]
    elif kind == 2:     # ramps (max correlation)
        yy, xx = np.mgrid[0:h, 0:w]
        planes = [((yy * 3 + xx + c) % (hi - lo) + lo).astype(np.int32)
                  for c in range(nc)]
    else:               # sparse impulses
        planes = []
        for _ in range(nc):
            p = np.zeros((h, w), np.int32)
            for _ in range(rng.randint(1, 8)):
                p[rng.randint(0, h), rng.randint(0, w)] = hi - 1
            planes.append(p)
    return planes, kw


def run(iterations=300, seed=0, quiet=False):
    from openjph_tpu import OjphError, decode, encode
    rng = np.random.RandomState(seed)
    n_ok = n_rej = n_oracle = 0
    for it in range(iterations):
        planes, kw = random_params(rng)
        try:
            stream = encode(planes, **kw)
        except (OjphError, ValueError) as e:
            n_rej += 1          # typed rejection is within contract
            continue
        outs = decode(stream)
        if kw['reversible']:
            for c, p in enumerate(planes):
                assert np.array_equal(outs[c], p), \
                    f'iter {it}: lossless round-trip broke ({kw})'
        n_ok += 1
        if os.path.exists(ORACLE) and rng.randint(0, 20) == 0 \
                and len(planes) in (1, 3) \
                and kw['bit_depth'] <= 16 and not kw['is_signed']:
            with tempfile.TemporaryDirectory() as td:
                j2c = os.path.join(td, 'f.j2c')
                open(j2c, 'wb').write(stream)
                ext = '.pgm' if len(planes) == 1 else '.ppm'
                r = subprocess.run(
                    [ORACLE, '-i', j2c, '-o',
                     os.path.join(td, 'f' + ext)],
                    capture_output=True, timeout=60)
                assert r.returncode == 0, \
                    f'iter {it}: oracle rejected our stream ({kw}):' \
                    f' {r.stderr[:300]}'
                n_oracle += 1
        if not quiet and (it + 1) % 50 == 0:
            print(f'{it + 1}/{iterations} ok={n_ok} rej={n_rej} '
                  f'oracle={n_oracle}', flush=True)
    if not quiet:
        print(f'done: {n_ok} encoded+decoded, {n_rej} typed '
              f'rejections, {n_oracle} oracle-checked')
    return n_ok, n_rej, n_oracle


if __name__ == '__main__':
    it = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    sd = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    run(it, sd)
