"""Native (C++) runtime components, loaded through ctypes.

Each module here has a pure-Python reference implementation elsewhere in the
package; the native build is an optimization, auto-compiled on first use when
a compiler is available and skipped (with the Python fallback) otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)


def _build(src_name, lib_name, extra_flags=()):
    src = os.path.join(_DIR, src_name)
    lib = os.path.join(_DIR, lib_name)
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    # -ffp-contract=off: these cores carry exact-parity contracts against
    # numpy f64 references (the BVH tracer's hit/tie structure, the iDT flip
    # predicates); FMA contraction under -march=native silently changes the
    # last bits of dot/cross chains and breaks argmin ties numpy resolves
    # differently.
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-fPIC",
           "-shared", "-std=c++17", *extra_flags, "-o", lib, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        raise RuntimeError(f"native build failed: {e}")
    return lib


_idt_lib = None
_localtri_lib = None
_bvh_lib = None


def load_bvh():
    """ctypes handle to the BVH host tracer, or None if the native build is
    unavailable. Falls back to a non-OpenMP build when libgomp is absent."""
    global _bvh_lib
    if _bvh_lib is not None:
        return _bvh_lib
    c = ctypes
    # Distinct filenames per flag variant: a stale OpenMP-linked .so must not
    # satisfy _build's mtime check when libgomp is absent (the CDLL failure
    # would then repeat forever and the fallback could never actually build).
    for flags, lib_name in ((("-fopenmp",), "libbvh.so"),
                            ((), "libbvh_serial.so")):
        try:
            lib = c.CDLL(_build("bvh.cpp", lib_name, extra_flags=flags))
            break
        except (RuntimeError, OSError):
            continue
    else:
        return None
    lib.bvh_create.restype = c.c_void_p
    lib.bvh_create.argtypes = [c.c_int64, c.POINTER(c.c_double)]
    lib.bvh_destroy.restype = None
    lib.bvh_destroy.argtypes = [c.c_void_p]
    lib.bvh_trace.restype = None
    lib.bvh_trace.argtypes = [
        c.c_void_p, c.c_int64,
        c.POINTER(c.c_double), c.POINTER(c.c_double),
        c.c_double, c.c_double, c.c_double,
        c.POINTER(c.c_double), c.POINTER(c.c_int32), c.POINTER(c.c_double),
    ]
    _bvh_lib = lib
    return lib


def load_localtri():
    """ctypes handle to the local-triangulation core, or None if the native
    build is unavailable."""
    global _localtri_lib
    if _localtri_lib is not None:
        return _localtri_lib
    try:
        lib = ctypes.CDLL(_build("localtri.cpp", "liblocaltri.so"))
    except (RuntimeError, OSError):
        return None
    lib.local_triangulation.restype = ctypes.c_int64
    lib.local_triangulation.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    _localtri_lib = lib
    return lib


def load_idt():
    """ctypes handle to the intrinsic-Delaunay flip core, or None if the
    native build is unavailable."""
    global _idt_lib
    if _idt_lib is not None:
        return _idt_lib
    try:
        lib = ctypes.CDLL(_build("idt.cpp", "libidt.so"))
    except (RuntimeError, OSError):
        return None
    lib.idt_flip.restype = ctypes.c_int64
    lib.idt_flip.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    _idt_lib = lib
    return lib
