"""ctypes bindings for the native lattice determinization (cpp/lattice.cc).

Same algorithm and semantics as lat/determinize.py (the C++ is a mirror of
the Python reference implementation, as cpp/wfst.cc mirrors
fst/algorithms.py); used by determinize_lattice_pruned when the library is
built (make -C cpp), falling back to Python silently otherwise.
"""

from __future__ import annotations

import ctypes
import math
import os
from typing import Optional

import numpy as np

from old_kaldi_git_tpu.lat.determinize import CompactLattice, CompactLatticeArc
from old_kaldi_git_tpu.lat.lattice import INF, Lattice
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("lat-native")

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "cpp",
    "libokt_wfst.so",
)
_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib if _lib != "missing" else None
    if not os.path.exists(_LIB_PATH):
        _lib = "missing"
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    if not hasattr(lib, "okt_lat_determinize"):
        _lib = "missing"  # stale library without the lattice kernels
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.okt_lat_determinize.restype = ctypes.c_void_p
    lib.okt_lat_determinize.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        i32p, i32p, i32p, i32p, f32p, f32p, f32p, f32p,
        ctypes.c_float, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.okt_lat_sizes.argtypes = [
        ctypes.c_void_p, i32p, i64p, i64p, i64p, i32p,
    ]
    lib.okt_lat_export.argtypes = [
        ctypes.c_void_p, i32p, i32p, i32p, f32p, f32p, i64p, i32p,
        f32p, f32p, i64p, i32p,
    ]
    lib.okt_lat_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _p(arr, ty):
    return arr.ctypes.data_as(ctypes.POINTER(ty))


def determinize_lattice_native(
    lat: Lattice,
    lattice_beam: float = math.inf,
    max_states: int = 500000,
    max_arcs: int = 2000000,
) -> Optional[CompactLattice]:
    """Native determinize; None when the library is unavailable; raises
    KaldiError on blow-up (mirroring the Python implementation)."""
    lib = _load()
    if lib is None:
        return None
    n = lat.num_states
    if n == 0:
        return CompactLattice()
    frm, to, il, ol, g, a = [], [], [], [], [], []
    for s in range(n):
        for arc in lat.arcs[s]:
            frm.append(s)
            to.append(arc.nextstate)
            il.append(arc.ilabel)
            ol.append(arc.olabel)
            g.append(arc.graph_cost)
            a.append(arc.acoustic_cost)
    frm = np.asarray(frm, np.int32)
    to = np.asarray(to, np.int32)
    il = np.asarray(il, np.int32)
    ol = np.asarray(ol, np.int32)
    g = np.asarray(g, np.float32)
    a = np.asarray(a, np.float32)
    fg = np.asarray([w[0] for w in lat.finals], np.float32)
    fa = np.asarray([w[1] for w in lat.finals], np.float32)
    h = lib.okt_lat_determinize(
        n, lat.start, len(frm),
        _p(frm, ctypes.c_int32), _p(to, ctypes.c_int32),
        _p(il, ctypes.c_int32), _p(ol, ctypes.c_int32),
        _p(g, ctypes.c_float), _p(a, ctypes.c_float),
        _p(fg, ctypes.c_float), _p(fa, ctypes.c_float),
        np.float32(lattice_beam), max_states, max_arcs,
    )
    if not h:
        raise KaldiError(
            "determinize_lattice (native): state/arc blow-up "
            f"(max_states={max_states}, max_arcs={max_arcs})"
        )
    try:
        ns = ctypes.c_int32()
        na = ctypes.c_int64()
        nt = ctypes.c_int64()
        nf = ctypes.c_int64()
        st = ctypes.c_int32()
        lib.okt_lat_sizes(
            h, ctypes.byref(ns), ctypes.byref(na), ctypes.byref(nt),
            ctypes.byref(nf), ctypes.byref(st),
        )
        S, A = ns.value, na.value
        af = np.zeros(A, np.int32)
        at = np.zeros(A, np.int32)
        aw = np.zeros(A, np.int32)
        ag = np.zeros(A, np.float32)
        aa = np.zeros(A, np.float32)
        aoff = np.zeros(A + 1, np.int64)
        atids = np.zeros(max(nt.value, 1), np.int32)
        fg2 = np.zeros(max(S, 1), np.float32)
        fa2 = np.zeros(max(S, 1), np.float32)
        foff = np.zeros(S + 1, np.int64)
        ftids = np.zeros(max(nf.value, 1), np.int32)
        lib.okt_lat_export(
            h, _p(af, ctypes.c_int32), _p(at, ctypes.c_int32),
            _p(aw, ctypes.c_int32), _p(ag, ctypes.c_float),
            _p(aa, ctypes.c_float), _p(aoff, ctypes.c_int64),
            _p(atids, ctypes.c_int32), _p(fg2, ctypes.c_float),
            _p(fa2, ctypes.c_float), _p(foff, ctypes.c_int64),
            _p(ftids, ctypes.c_int32),
        )
    finally:
        lib.okt_lat_destroy(h)
    clat = CompactLattice()
    for _ in range(S):
        clat.add_state()
    clat.start = int(st.value)
    for i in range(A):
        tids = tuple(int(x) for x in atids[aoff[i]: aoff[i + 1]])
        clat.arcs[int(af[i])].append(
            CompactLatticeArc(int(aw[i]), float(ag[i]), float(aa[i]),
                              tids, int(at[i]))
        )
    for s in range(S):
        if np.isfinite(fg2[s]):
            clat.finals[s] = (
                float(fg2[s]), float(fa2[s]),
                tuple(int(x) for x in ftids[foff[s]: foff[s + 1]]),
            )
    return clat
