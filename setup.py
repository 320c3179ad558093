"""Build hook: compile the native audio codec library into the wheel.

The C++ loader (``native/wavload.cpp`` + ``native/flac.cpp``) is an
optional fast path — ``tpuvae.io`` falls back to the pure-Python decoders
when it is absent, so a failed compile only warns.  The library is placed
at ``tpuvae/_native/libwavload.so`` where
``tpuvae.io.native_loader._find_lib_path`` looks for installed packages
(source checkouts instead build ``native/libwavload.so`` on first use).
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = Path(__file__).resolve().parent
        out_dir = root / "tpuvae" / "_native"
        out_dir.mkdir(exist_ok=True)
        srcs = [root / "native" / "wavload.cpp", root / "native" / "flac.cpp"]
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", str(out_dir / "libwavload.so")] + [str(s) for s in srcs],
                check=True, timeout=300,
            )
        except Exception as exc:  # toolchain optional: pure-Python fallback
            print(f"warning: native codec build skipped ({exc}); "
                  f"tpuvae.io will use the pure-Python decoders",
                  file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
