"""Build hooks: the optional native WFDB decoder extension.

The extension accelerates record loading (scgrhc/native/_wfdbfast.c) but
every call site has a NumPy fallback, so a failed compile must never
fail the install.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as e:  # toolchain absent: install pure-python
            print(f"warning: skipping native extension build ({e})")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:
            print(f"warning: skipping {ext.name} ({e})")


def _ext_modules():
    try:
        import numpy as np
    except ImportError:
        return []
    return [
        Extension(
            "scgrhc.native._wfdbfast",
            ["scgrhc/native/_wfdbfast.c"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3"],
        )
    ]


setup(ext_modules=_ext_modules(), cmdclass={"build_ext": OptionalBuildExt})
