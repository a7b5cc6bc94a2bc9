"""ctypes bindings for the native graph-plane library (cpp/wfst.cc).

Drop-in accelerated versions of compose / determinize_star /
minimize_encoded / remove_eps_local for large graph builds; semantics are
equivalence-tested against the Python implementations on random FSTs.
Falls back silently when the library has not been built (make -C cpp).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from old_kaldi_git_tpu.fst.vector_fst import INF, Arc, VectorFst
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("fst-native")

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
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.okt_fst_create.restype = ctypes.c_void_p
    lib.okt_fst_create.argtypes = [
        ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p, f32p, i32p, f32p,
    ]
    lib.okt_fst_destroy.argtypes = [ctypes.c_void_p]
    lib.okt_fst_num_states.restype = ctypes.c_int32
    lib.okt_fst_num_states.argtypes = [ctypes.c_void_p]
    lib.okt_fst_num_arcs.restype = ctypes.c_int64
    lib.okt_fst_num_arcs.argtypes = [ctypes.c_void_p]
    lib.okt_fst_start.restype = ctypes.c_int32
    lib.okt_fst_start.argtypes = [ctypes.c_void_p]
    lib.okt_fst_export.argtypes = [
        ctypes.c_void_p, i32p, i32p, i32p, f32p, i32p, f32p,
    ]
    lib.okt_compose.restype = ctypes.c_void_p
    lib.okt_compose.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.okt_determinize_star.restype = ctypes.c_void_p
    lib.okt_determinize_star.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int64,
    ]
    lib.okt_minimize_encoded.restype = ctypes.c_void_p
    lib.okt_minimize_encoded.argtypes = [ctypes.c_void_p]
    lib.okt_remove_eps_local.argtypes = [ctypes.c_void_p]
    lib.okt_connect.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _to_handle(lib, fst: VectorFst):
    n = fst.num_states
    counts = np.asarray([len(a) for a in fst.arcs], np.int32)
    row_ptr = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=row_ptr[1:])
    a_total = int(row_ptr[-1])
    il = np.zeros(a_total, np.int32)
    ol = np.zeros(a_total, np.int32)
    w = np.zeros(a_total, np.float32)
    ns = np.zeros(a_total, np.int32)
    i = 0
    for lst in fst.arcs:
        for a in lst:
            il[i], ol[i], w[i], ns[i] = a.ilabel, a.olabel, a.weight, a.nextstate
            i += 1
    finals = np.asarray(
        [f if f != INF else np.inf for f in fst.finals], np.float32
    )

    def p32(x):
        return x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def pf(x):
        return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    return lib.okt_fst_create(
        n, fst.start, p32(row_ptr), p32(il), p32(ol), pf(w), p32(ns), pf(finals)
    )


def _from_handle(lib, h) -> VectorFst:
    n = lib.okt_fst_num_states(h)
    a = lib.okt_fst_num_arcs(h)
    row_ptr = np.zeros(n + 1, np.int32)
    il = np.zeros(a, np.int32)
    ol = np.zeros(a, np.int32)
    w = np.zeros(a, np.float32)
    ns = np.zeros(a, np.int32)
    finals = np.zeros(n, np.float32)

    def p32(x):
        return x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def pf(x):
        return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    lib.okt_fst_export(h, p32(row_ptr), p32(il), p32(ol), pf(w), p32(ns), pf(finals))
    fst = VectorFst()
    for _ in range(n):
        fst.add_state()
    fst.start = lib.okt_fst_start(h)
    for s in range(n):
        for i in range(row_ptr[s], row_ptr[s + 1]):
            fst.add_arc(s, Arc(int(il[i]), int(ol[i]), float(w[i]), int(ns[i])))
        if np.isfinite(finals[s]):
            fst.set_final(s, float(finals[s]))
    return fst


def _unary(name):
    def op(fst: VectorFst, **kw) -> VectorFst:
        lib = _load()
        if lib is None:
            raise KaldiError("native wfst library not built (make -C cpp)")
        h = _to_handle(lib, fst)
        try:
            if name == "determinize_star":
                out_h = lib.okt_determinize_star(
                    h, 1 if kw.get("use_log", False) else 0,
                    kw.get("max_states", 5_000_000),
                )
                if not out_h:
                    raise KaldiError("native determinize_star failed (blow-up?)")
            elif name == "minimize_encoded":
                out_h = lib.okt_minimize_encoded(h)
            elif name == "remove_eps_local":
                lib.okt_remove_eps_local(h)
                out_h = None
            else:
                raise KaldiError(name)
            result = _from_handle(lib, out_h if out_h else h)
        finally:
            lib.okt_fst_destroy(h)
            if name != "remove_eps_local" and "out_h" in locals() and out_h:
                lib.okt_fst_destroy(out_h)
        return result

    return op


determinize_star = _unary("determinize_star")
minimize_encoded = _unary("minimize_encoded")
remove_eps_local_copy = _unary("remove_eps_local")


def compose(a: VectorFst, b: VectorFst) -> VectorFst:
    lib = _load()
    if lib is None:
        raise KaldiError("native wfst library not built (make -C cpp)")
    ha = _to_handle(lib, a)
    hb = _to_handle(lib, b)
    try:
        hc = lib.okt_compose(ha, hb)
        out = _from_handle(lib, hc)
        lib.okt_fst_destroy(hc)
    finally:
        lib.okt_fst_destroy(ha)
        lib.okt_fst_destroy(hb)
    return out
