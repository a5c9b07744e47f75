"""Deterministic slice of the decode fuzzer (fuzzing/fuzz_decode.py):
mutated streams must fail only with ValueError/EOFError and resilient
mode must stay exception-free past header parsing.  The reference
covers this contract with libFuzzer + OSS-Fuzz (SURVEY.md §4.4)."""
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'fuzzing'))


def test_fuzz_decode_smoke():
    import fuzz_decode
    stats = fuzz_decode.run(iterations=120, seed=1234, quiet=True)
    assert sum(stats.values()) > 0
    # the foreign-seed corpus (oracle-encoded configs) must be loaded
    assert len(fuzz_decode.load_corpus()) >= 50


def test_fuzz_decode_fused_vs_scalar():
    """Fused pipeline must match the scalar decoder bit-for-bit on
    every mutated stream both accept (bounded seed subset: the fused
    path compiles per geometry)."""
    import fuzz_decode
    stats = fuzz_decode.run(iterations=15, seed=77, quiet=True,
                            tpu_path=True, seed_subset=3)
    assert stats['tpu_ok'] > 0


def test_fuzz_encode_smoke():
    import fuzz_encode as fe
    n_ok, n_rej, _ = fe.run(iterations=40, seed=3, quiet=True)
    assert n_ok + n_rej == 40 and n_ok > 0
