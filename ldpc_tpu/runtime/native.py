"""ctypes bindings for the native C++ graph builder.

Builds ``csrc/graph_builder.cpp`` on demand (g++, cached as a .so next to
this module) and exposes drop-in replacements for the hot host-side layout
construction.  Falls back silently to the numpy implementations when no
compiler is available (set ``LDPC_TPU_NO_NATIVE=1`` to force the fallback).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from ldpc_tpu.codes.base_graphs import BaseGraph
from ldpc_tpu.codes.edge_layout import EdgeLayout

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "graph_builder.cpp"
_SO = Path(__file__).parent / "_graph_builder.so"
_lib = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("LDPC_TPU_NO_NATIVE") == "1":
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(_SO)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ldpc_parse_base_matrix.argtypes = [ctypes.c_char_p, i32p, ctypes.c_int64, i32p, i32p]
    lib.ldpc_parse_base_matrix.restype = ctypes.c_int
    lib.ldpc_enumerate_edges.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int32, ctypes.c_int32, i32p, i32p, ctypes.c_int64,
    ]
    lib.ldpc_enumerate_edges.restype = ctypes.c_int64
    lib.ldpc_neighbor_tables.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.ldpc_neighbor_tables.restype = ctypes.c_int
    lib.ldpc_max_group_size.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32]
    lib.ldpc_max_group_size.restype = ctypes.c_int32
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def load_base_matrix_native(path: str | Path) -> BaseGraph | None:
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(1 << 20, dtype=np.int32)
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    rc = lib.ldpc_parse_base_matrix(str(path).encode(), _i32ptr(buf), buf.size,
                                    ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise ValueError(f"native base-matrix parse failed ({rc}) for {path}")
    shifts = buf[: rows.value * cols.value].reshape(rows.value, cols.value).copy()
    return BaseGraph(name=Path(path).stem, shifts=shifts)


def _neighbor_tables(group: np.ndarray, num_groups: int, E: int, lib) -> np.ndarray:
    group = np.ascontiguousarray(group, dtype=np.int32)
    width = max(int(lib.ldpc_max_group_size(_i32ptr(group), E, num_groups)) - 1, 1)
    out = np.empty((E, width), dtype=np.int32)
    rc = lib.ldpc_neighbor_tables(_i32ptr(group), E, num_groups, width, _i32ptr(out))
    if rc != 0:
        raise RuntimeError(f"neighbor table build failed ({rc})")
    return out


def edge_layout_from_H_native(H: np.ndarray) -> EdgeLayout | None:
    """Native counterpart of :func:`ldpc_tpu.codes.edge_layout_from_H`."""
    lib = _load()
    if lib is None:
        return None
    H = np.asarray(H)
    if H.dtype in (np.int8, np.uint8, np.bool_) and H.flags.c_contiguous:
        # The C side only tests non-zeroness; any byte-sized dtype works
        # as-is.  The copying conversion below costs ~4 s at Z=384 (322 MB
        # dense H) — more than the entire native build.
        H8 = H.view(np.int8)
    else:
        H8 = np.ascontiguousarray(np.asarray(H) != 0, dtype=np.int8)
    m, n = H8.shape
    # count_nonzero, not sum: byte-dtype inputs may encode edges as any
    # nonzero value (e.g. -1 markers), which the fast path passes through.
    cap = int(np.count_nonzero(H8))
    ev = np.empty(cap, dtype=np.int32)
    ec = np.empty(cap, dtype=np.int32)
    E = int(lib.ldpc_enumerate_edges(
        H8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), m, n, _i32ptr(ev), _i32ptr(ec), cap,
    ))
    if E < 0:
        raise RuntimeError(f"edge enumeration failed ({E})")
    check_nbr = _neighbor_tables(ec, m, E, lib)
    var_nbr = _neighbor_tables(ev, n, E, lib)
    return EdgeLayout(num_checks=m, num_vars=n, edge_var=ev, edge_check=ec,
                      check_nbr=check_nbr, var_nbr=var_nbr)
