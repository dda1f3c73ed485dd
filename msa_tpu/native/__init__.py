"""C++ host runtime (loaded via ctypes).

Native equivalents of the reference's C++ components: the sequential NW
oracle (``seqalign-mpi-skeleton.cpp:186-280``) and the traceback walker.
Built by ``msa_tpu/native/build.py`` into ``libmsanative.so``; every entry
point gracefully reports unavailability so pure-Python environments work.
"""

from __future__ import annotations

from msa_tpu.native.lib import (  # noqa: F401
    native_available,
    nw_align_native,
    nw_score_native,
)
