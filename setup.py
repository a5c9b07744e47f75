"""Build hooks: prebuild the native host-kernel library into wheels.

The runtime (openjph_tpu/native/__init__.py) builds
`_ojtpu_native.so` on demand with g++ and falls back to numpy when no
compiler is available, so installation never *requires* a toolchain.
This hook simply front-loads that build at wheel-build time so
installed environments get the native Tier-2/bit-packing path without
a first-use compile.
"""
import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        super().run()
        src = os.path.join('openjph_tpu', 'native', 'ojtpu_native.cpp')
        for out_root in [self.build_lib]:
            out = os.path.join(out_root, 'openjph_tpu', 'native',
                               '_ojtpu_native.so')
            try:
                subprocess.run(
                    ['g++', '-O3', '-shared', '-fPIC', '-o', out, src],
                    check=True)
                print(f'built native library: {out}')
            except (OSError, subprocess.CalledProcessError) as e:
                # non-fatal: runtime falls back to on-demand build/numpy
                print(f'warning: native prebuild skipped ({e})')


setup(cmdclass={'build_py': build_py_with_native})
