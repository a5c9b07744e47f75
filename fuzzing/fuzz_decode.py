#!/usr/bin/env python
"""Decode fuzzer (the reference's libFuzzer analogue,
fuzzing/fuzz_targets/ojph_expand_fuzz_target.cpp).

Strategy: start from valid self-encoded seed streams, apply random
byte mutations (flips, truncations, splices), and decode in both
strict and resilient modes.  The contract under fuzz: decoding raises
only ValueError/EOFError (strict) and never raises in resilient mode
for streams whose main header survives; no hangs, no crashes.  The
same work-explosion guards as the reference apply (bounded samples /
decompositions via the seed geometry).

Usage: python fuzzing/fuzz_decode.py [iterations] [seed]
"""
import os
import sys

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


def load_corpus():
    """Committed foreign-seed corpus: ojph_compress-encoded streams
    across the config grid plus oracle-validated Part-2 exotics
    (tools/gen_fuzz_corpus.py) — the analogue of the reference's
    fuzzing/seed_corpus/."""
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     'seed_corpus')
    if not os.path.isdir(d):
        return []
    return [open(os.path.join(d, f), 'rb').read()
            for f in sorted(os.listdir(d)) if f.endswith('.j2c')]


def make_seeds():
    from openjph_tpu import encode
    rng = np.random.RandomState(7)
    seeds = list(load_corpus())
    img = rng.randint(0, 256, (64, 80)).astype(np.int32)
    seeds.append(encode([img], reversible=True, num_decomps=3,
                        block_size=(32, 32)))
    rgb = rng.randint(0, 256, (48, 52, 3)).astype(np.int32)
    seeds.append(encode(rgb, reversible=True))
    seeds.append(encode(rgb, reversible=False, base_delta=1 / 256))
    seeds.append(encode([img], reversible=True, tile_size=(32, 32),
                        prog_order=0))
    # multi-pass streams: SigProp/MagRef segments reach the fused
    # refinement kernels (tpu/block_refine.py) and their on-device
    # unstuffers
    sp = img.copy()
    sp[rng.rand(64, 80) < 0.5] = 0
    seeds.append(encode([sp], reversible=True, num_decomps=2,
                        ht_passes=3))
    seeds.append(encode([sp], reversible=True, num_decomps=2,
                        ht_passes=2, vert_causal=True))
    return seeds


def mutate(rng, data: bytes) -> bytes:
    b = bytearray(data)
    op = rng.randint(0, 4)
    if op == 0 and len(b) > 2:                 # flip random bytes
        for _ in range(rng.randint(1, 9)):
            b[rng.randint(0, len(b))] ^= 1 << rng.randint(0, 8)
    elif op == 1 and len(b) > 4:               # truncate
        b = b[:rng.randint(2, len(b))]
    elif op == 2 and len(b) > 8:               # splice a chunk
        i = rng.randint(0, len(b) - 4)
        j = rng.randint(0, len(b) - 4)
        n = rng.randint(1, 64)
        b[i:i + n] = b[j:j + n]
    else:                                      # random insert
        i = rng.randint(0, len(b))
        b[i:i] = bytes(rng.randint(0, 256, rng.randint(1, 16),
                                   dtype=np.uint8))
    return bytes(b)


def _paths_agree(hdr, host_planes, tpu_planes, ctx):
    """Cross-path output contract: reversible components bit-exact;
    irreversible (9/7 float) components within PAE 1 after clamping —
    host numpy and XLA (FMA-fused) float pipelines can differ in the
    last ULP, the same +-1 integer tolerance the reference test suite
    grants its own decoder (test_executables.cpp TOL_INTEGER)."""
    for c, (a, b) in enumerate(zip(host_planes, tpu_planes)):
        ci = hdr.siz.comps[c]
        lo, hi = ((-(1 << (ci.bit_depth - 1)),
                   (1 << (ci.bit_depth - 1)) - 1)
                  if ci.is_signed else (0, (1 << ci.bit_depth) - 1))
        aa = np.clip(a, lo, hi).astype(np.int64)
        bb = np.clip(b, lo, hi).astype(np.int64)
        if hdr.get_cod(c).is_reversible:
            assert np.array_equal(aa, bb), \
                f'fused/scalar divergence ({ctx}, comp {c})'
        else:
            pae = int(np.abs(aa - bb).max()) if aa.size else 0
            assert pae <= 1, \
                f'fused/scalar 9/7 PAE {pae} ({ctx}, comp {c})'


def run(iterations=1000, seed=0, quiet=False, tpu_path=False,
        seed_subset=None):
    """``tpu_path`` also decodes through the fused pipeline
    (TpuDecoder: Tier-2 record mode + on-device unstuffing, forced on
    CPU) — the same raise-only-ValueError/EOFError contract plus
    bit-equality with the scalar decoder on accepted streams.
    ``seed_subset`` limits the pool to every Nth seed: the fused path
    jit-compiles per geometry, so a bounded subset keeps its runner
    cache warm instead of compile-storming across the whole corpus."""
    from openjph_tpu import decode
    if tpu_path:
        import openjph_tpu.tpu.pipeline as P
        P._DEVICE_UNSTUFF = True
        from openjph_tpu.tpu.pipeline import decode_tpu
        # corrupt streams mint a fresh plan key (and so a compile)
        # per iteration; keep the runner LRU tiny and periodically
        # drop jax's global trace/executable caches or the CPU
        # compiler eventually OOMs (fuzz-found; mirrors the reference
        # fuzz targets' work-explosion guards)
        P._RUNNERS._cap = 8
    seeds = make_seeds()
    if seed_subset:
        seeds = seeds[::max(1, len(seeds) // seed_subset)][:seed_subset]
    rng = np.random.RandomState(seed)
    stats = {'ok': 0, 'valueerror': 0, 'eof': 0, 'resilient_ok': 0,
             'tpu_ok': 0}
    for it in range(iterations):
        data = mutate(rng, seeds[rng.randint(0, len(seeds))])
        host_out = None
        try:
            host_out = decode(data)
            stats['ok'] += 1
        except ValueError:
            stats['valueerror'] += 1
        except EOFError:
            stats['eof'] += 1
        if tpu_path:
            try:
                tpu_out = decode_tpu(data)
                stats['tpu_ok'] += 1
                # when both paths accept the stream, the fused decode
                # must be bit-identical to the scalar decode (wrong
                # bits, not exceptions, are the likely failure mode
                # of the vectorized unstuff/decode kernels).  Corrupt
                # streams can decode to out-of-range samples: the
                # scalar API returns them raw (reference-library
                # semantics) while the fused narrow-dtype output
                # saturates (reference-writer semantics) — compare
                # after clamping to the fused dtype's range.
                if host_out is not None:
                    from openjph_tpu.core import markers as mk
                    _paths_agree(mk.read_main_header(data), host_out,
                                 tpu_out, f'strict, iteration {it}')
            except (ValueError, EOFError):
                pass
        # resilient mode must not raise once headers parse; a raise
        # from header parsing itself is contractual
        res_out = None
        try:
            res_out = decode(data, resilient=True)
            stats['resilient_ok'] += 1
        except (ValueError, EOFError):
            pass
        if tpu_path:
            # round 5: resilience runs ON the fused path (broken
            # lanes deadened at plan time / zeroed in-graph).  Same
            # no-raise contract as scalar resilient; output equality
            # is asserted only for streams STRICT mode accepts —
            # there resilience must not change the result (the
            # planner must not deaden valid lanes).  On corrupt
            # blocks neither implementation's sample values are
            # defined (the scalar and vectorized Tier-1 decoders
            # produce different garbage, like the reference's generic
            # vs SIMD variants would), so only validity-gated
            # comparisons are contractual.
            try:
                tpu_res = decode_tpu(data, resilient=True)
                stats['tpu_resilient_ok'] = \
                    stats.get('tpu_resilient_ok', 0) + 1
                if host_out is not None and res_out is not None:
                    from openjph_tpu.core import markers as mk
                    _paths_agree(mk.read_main_header(data), res_out,
                                 tpu_res,
                                 f'resilient, iteration {it}')
            except (ValueError, EOFError):
                pass
        if tpu_path and it and it % 25 == 0:
            # mutated streams compile a fresh runner nearly every
            # iteration (~30-50 MB each incl. jax's trace caches);
            # clear aggressively or the CPU compiler OOMs within
            # ~100 iterations under a container memory limit
            import gc
            import jax as _jax
            _jax.clear_caches()
            gc.collect()
        if not quiet and it and it % 100 == 0:
            print(f'{it}: {stats}')
    if not quiet:
        print('done:', stats)
    return stats


if __name__ == '__main__':
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    sd = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    tpu = '--tpu' in sys.argv
    if tpu and iters > 150 and '--child' not in sys.argv:
        # --tpu mode compiles a fresh runner for nearly every mutated
        # stream; XLA-CPU's compile arenas never shrink in-process
        # (clear_caches bounds but cannot reclaim), so long campaigns
        # run as fresh-process batches — the libFuzzer-style restart
        # discipline
        import subprocess
        at = 0
        while at < iters:
            n = min(150, iters - at)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(n),
                 str(sd + at), '--tpu', '--child'])
            if r.returncode != 0:
                sys.exit(r.returncode)
            at += n
        print(f'done: {iters} iterations in fresh-process batches')
        sys.exit(0)
    run(iters, sd, tpu_path=tpu, seed_subset=6 if tpu else None)
