"""TPU compute path: jittable JAX/Pallas implementations of the hot
HTJ2K kernels (DWT lifting, color transforms, quantization, and the
batched HT block codec).

The NumPy modules under ``openjph_tpu.ops`` / ``openjph_tpu.coding``
are the scalar oracle; everything here must match them bit-exactly on
the reversible path (verified by tests/test_tpu_ops.py and
tests/test_tpu_block.py).
"""
