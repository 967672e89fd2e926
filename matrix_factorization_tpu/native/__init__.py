"""Native (C++) host runtime components, bound via ctypes.

Currently: the multithreaded rating-stream loader (``loader.cpp``).  Built
on demand by :mod:`matrix_factorization_tpu.data.loader`; every consumer
has a pure-Python fallback, so the package works without a toolchain.
"""
