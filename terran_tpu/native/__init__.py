"""Native (C++) host-runtime components, built on demand.

The reference delegates all native-performance work to dependencies
(torchvision NMS, OpenCV, ffmpeg, SURVEY §2); this framework's device work
is XLA, and the remaining host-hot sequential stage — OpenPose greedy
matching + human assembly — is implemented in C++ here.

The extension is a plain C-ABI shared object compiled lazily with g++ into
the framework home (cached by source hash) and bound via ctypes — no
pybind11/Python headers needed. When no compiler is available everything
falls back to the pure-Python implementations in
``terran_tpu/pose/assembly.py``; behaviour is identical (tested).

Disable with ``TERRAN_TPU_NATIVE=0``.
"""

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SOURCE = Path(__file__).parent / "assembly.cpp"
_lib = None
_lib_tried = False


def _build_library():
    source = _SOURCE.read_text()
    digest = hashlib.sha256(source.encode()).hexdigest()[:16]

    from terran_tpu.checkpoint import get_home

    cache_dir = get_home() / "native"
    cache_dir.mkdir(parents=True, exist_ok=True)
    so_path = cache_dir / f"assembly-{digest}.so"
    if so_path.exists():
        return so_path

    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        str(_SOURCE), "-o", str(so_path),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def _load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True

    if os.environ.get("TERRAN_TPU_NATIVE", "1") == "0":
        return None
    try:
        so_path = _build_library()
        lib = ctypes.CDLL(str(so_path))
    except Exception:
        return None

    lib.greedy_connections.restype = ctypes.c_int
    lib.greedy_connections.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.assemble_humans.restype = ctypes.c_int
    lib.assemble_humans.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def native_available():
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def greedy_connections_native(reg_scores, accept, count_src, count_dst):
    """C++ greedy matching; same contract as
    ``terran_tpu.pose.assembly.greedy_connections``."""
    lib = _load()
    k = reg_scores.shape[0]
    reg = np.ascontiguousarray(reg_scores, dtype=np.float32)
    acc = np.ascontiguousarray(accept, dtype=np.uint8)
    out = np.zeros((k, 3), dtype=np.float64)
    n = lib.greedy_connections(
        _ptr(reg, ctypes.c_float), _ptr(acc, ctypes.c_uint8),
        k, int(count_src), int(count_dst), _ptr(out, ctypes.c_double),
    )
    return out[:n]


def assemble_humans_native(peak_scores, counts, offsets, reg_scores, accept,
                           limbseq, human_threshold=0.4, max_humans=256):
    """C++ human assembly; returns the (n, 20) humans array in the
    reference layout."""
    lib = _load()
    num_limbs, k, _ = reg_scores.shape
    num_parts = peak_scores.shape[0]

    ps = np.ascontiguousarray(peak_scores, dtype=np.float32)
    cn = np.ascontiguousarray(counts, dtype=np.int32)
    of = np.ascontiguousarray(offsets, dtype=np.int32)
    rg = np.ascontiguousarray(reg_scores, dtype=np.float32)
    ac = np.ascontiguousarray(accept, dtype=np.uint8)
    ls = np.ascontiguousarray(limbseq, dtype=np.int32)
    out = np.zeros((max_humans, 20), dtype=np.float64)

    n = lib.assemble_humans(
        _ptr(ps, ctypes.c_float), _ptr(cn, ctypes.c_int),
        _ptr(of, ctypes.c_int), _ptr(rg, ctypes.c_float),
        _ptr(ac, ctypes.c_uint8), _ptr(ls, ctypes.c_int),
        num_parts, num_limbs, k, float(human_threshold), max_humans,
        _ptr(out, ctypes.c_double),
    )
    return out[:n]
