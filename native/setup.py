"""Build the native batch assembler extension in place.

Usage:  cd native && python setup.py build_ext --inplace
(or ``python -m dlwp_tpu.data.native --build`` which shells out to this).
"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="dlwp_tpu_native",
    ext_modules=[
        Extension(
            "_batch_assembler",
            sources=["batch_assembler.c"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-march=native"],
        )
    ],
)
