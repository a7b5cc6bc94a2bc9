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
    lib.okt_compose_context.restype = ctypes.c_void_p
    lib.okt_compose_context.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, i32p,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.okt_ctx_num_ilabels.restype = ctypes.c_int32
    lib.okt_ctx_num_ilabels.argtypes = [ctypes.c_void_p]
    lib.okt_ctx_info_total.restype = ctypes.c_int64
    lib.okt_ctx_info_total.argtypes = [ctypes.c_void_p]
    lib.okt_ctx_export_info.argtypes = [ctypes.c_void_p, i32p, i32p]
    lib.okt_ctx_take_fst.restype = ctypes.c_void_p
    lib.okt_ctx_take_fst.argtypes = [ctypes.c_void_p]
    lib.okt_ctx_destroy.argtypes = [ctypes.c_void_p]
    lib.okt_add_self_loops.restype = ctypes.c_void_p
    lib.okt_add_self_loops.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int32, i32p, f32p, f32p,
        ctypes.c_int32,
    ]
    lib.okt_push_special.argtypes = [
        ctypes.c_void_p, ctypes.c_float, ctypes.c_int32,
    ]
    lib.okt_rm_symbols.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.okt_fst_to_csr.restype = ctypes.c_void_p
    lib.okt_fst_to_csr.argtypes = [ctypes.c_void_p]
    lib.okt_csr_sizes.argtypes = [ctypes.c_void_p, i32p]
    lib.okt_csr_export.argtypes = [
        ctypes.c_void_p, i32p, i32p, f32p, i32p, f32p, i32p, i32p, i32p,
        i32p,
    ]
    lib.okt_csr_destroy.argtypes = [ctypes.c_void_p]
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


# ---------------------------------------------------------------------------
# Handle-based pipeline API
# ---------------------------------------------------------------------------
# For large graph builds (mkgraph at 20k-word trigram scale and beyond), the
# Python VectorFst round-trip between every stage dominates.  NativeFst keeps
# the graph in the C++ library across the whole pipeline; only the final CSR
# arrays cross back into numpy.


def _p32(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _pf(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeFst:
    """Owning wrapper around a native Fst handle."""

    def __init__(self, handle):
        if not handle:
            raise KaldiError("null native fst handle")
        self._h = handle

    def __del__(self):
        try:
            lib = _load()
            if lib is not None and getattr(self, "_h", None):
                lib.okt_fst_destroy(self._h)
                self._h = None
        except Exception:
            # interpreter teardown: module globals (ctypes, _load) may
            # already be gone; leaking the handle at exit is fine
            pass

    @property
    def num_states(self) -> int:
        return _load().okt_fst_num_states(self._h)

    @property
    def num_arcs(self) -> int:
        return _load().okt_fst_num_arcs(self._h)

    @property
    def start(self) -> int:
        return _load().okt_fst_start(self._h)

    @staticmethod
    def from_vector_fst(fst: VectorFst) -> "NativeFst":
        lib = _load()
        if lib is None:
            raise KaldiError("native wfst library not built (make -C cpp)")
        return NativeFst(_to_handle(lib, fst))

    @staticmethod
    def from_arrays(
        start: int,
        row_ptr: np.ndarray,
        ilabels: np.ndarray,
        olabels: np.ndarray,
        weights: np.ndarray,
        nextstates: np.ndarray,
        finals: np.ndarray,
    ) -> "NativeFst":
        """Zero-object construction from flat CSR-layout arrays (the fast
        path for vectorized G/L builders)."""
        lib = _load()
        if lib is None:
            raise KaldiError("native wfst library not built (make -C cpp)")
        n = len(finals)
        row_ptr = np.ascontiguousarray(row_ptr, np.int32)
        ilabels = np.ascontiguousarray(ilabels, np.int32)
        olabels = np.ascontiguousarray(olabels, np.int32)
        weights = np.ascontiguousarray(weights, np.float32)
        nextstates = np.ascontiguousarray(nextstates, np.int32)
        finals = np.ascontiguousarray(finals, np.float32)
        return NativeFst(lib.okt_fst_create(
            n, start, _p32(row_ptr), _p32(ilabels), _p32(olabels),
            _pf(weights), _p32(nextstates), _pf(finals),
        ))

    def to_vector_fst(self) -> VectorFst:
        return _from_handle(_load(), self._h)

    # -- pipeline ops (each returns a new NativeFst unless noted in-place) --

    def compose(self, other: "NativeFst") -> "NativeFst":
        return NativeFst(_load().okt_compose(self._h, other._h))

    def determinize_star(self, use_log: bool = False,
                         max_states: int = 100_000_000) -> "NativeFst":
        h = _load().okt_determinize_star(
            self._h, 1 if use_log else 0, max_states)
        if not h:
            raise KaldiError("native determinize_star failed (blow-up?)")
        return NativeFst(h)

    def minimize_encoded(self) -> "NativeFst":
        return NativeFst(_load().okt_minimize_encoded(self._h))

    def remove_eps_local(self) -> None:
        _load().okt_remove_eps_local(self._h)

    def connect(self) -> None:
        _load().okt_connect(self._h)

    def push_special(self, delta: float = 1e-3, max_iters: int = 200) -> None:
        _load().okt_push_special(self._h, delta, max_iters)

    def rm_symbols(self, labels, side: str = "input") -> None:
        lib = _load()
        arr = np.ascontiguousarray(sorted(labels), np.int32)
        lib.okt_rm_symbols(
            self._h, _p32(arr), len(arr), 0 if side == "input" else 1)

    def compose_context(self, N: int, P: int, disambig_ids,
                        subseq_symbol: int):
        """Returns (clg: NativeFst, ilabel_info: List[List[int]])."""
        lib = _load()
        dis = np.ascontiguousarray(sorted(disambig_ids), np.int32)
        res = lib.okt_compose_context(
            self._h, N, P, _p32(dis), len(dis), subseq_symbol)
        if not res:
            raise KaldiError("native compose_context failed")
        try:
            n = lib.okt_ctx_num_ilabels(res)
            total = lib.okt_ctx_info_total(res)
            offsets = np.zeros(n + 1, np.int32)
            values = np.zeros(max(total, 1), np.int32)
            lib.okt_ctx_export_info(res, _p32(offsets), _p32(values))
            ilabel_info = [
                values[offsets[i]:offsets[i + 1]].tolist() for i in range(n)
            ]
            fst = NativeFst(lib.okt_ctx_take_fst(res))
        finally:
            lib.okt_ctx_destroy(res)
        return fst, ilabel_info

    def add_self_loops(self, tm, self_loop_scale: float = 0.1) -> "NativeFst":
        """AddSelfLoops with per-tstate data exported from the
        TransitionModel (hmm/hmm_utils.py semantics)."""
        import math

        lib = _load()
        num_ts = len(tm.tuples)
        tid_tstate = np.ascontiguousarray(tm._id2state, np.int32)
        ts_self_tid = np.zeros(num_ts + 1, np.int32)
        ts_loop_w = np.zeros(num_ts + 1, np.float32)
        ts_fwd_w = np.zeros(num_ts + 1, np.float32)
        for ts in range(num_ts):
            loop_tid = tm.self_loop_tid(ts)
            ts_self_tid[ts] = loop_tid
            if loop_tid:
                p_self = tm.self_loop_prob(ts)
                ts_loop_w[ts] = -self_loop_scale * math.log(max(p_self, 1e-20))
                if p_self > 0.0:
                    ts_fwd_w[ts] = -self_loop_scale * math.log(
                        max(1.0 - p_self, 1e-20))
        return NativeFst(lib.okt_add_self_loops(
            self._h, _p32(tid_tstate), tm.num_tids, _p32(ts_self_tid),
            _pf(ts_loop_w), _pf(ts_fwd_w), num_ts,
        ))

    def to_raw_arrays(self):
        """Raw (start, row_ptr, ilabels, olabels, weights, nextstates,
        finals) numpy export — arcs as stored, eps included, no Python
        arc objects (the split-eps CSR path builds from these)."""
        lib = _load()
        n = lib.okt_fst_num_states(self._h)
        a = lib.okt_fst_num_arcs(self._h)
        row_ptr = np.zeros(n + 1, np.int32)
        il = np.zeros(a, np.int32)
        ol = np.zeros(a, np.int32)
        w = np.zeros(a, np.float32)
        ns = np.zeros(a, np.int32)
        finals = np.zeros(n, np.float32)
        lib.okt_fst_export(self._h, _p32(row_ptr), _p32(il), _p32(ol),
                           _pf(w), _p32(ns), _pf(finals))
        return (lib.okt_fst_start(self._h), row_ptr, il, ol, w, ns, finals)

    def to_csr_arrays(self):
        """Eps-forwarded CSR export (decoder/csr.py::fst_to_csr semantics).

        Returns (start, row_ptr, tid, weight, nextstate, final_weight,
        olab_off, olab_val, folab_off, folab_val) as numpy arrays; olabel
        runs are flattened (olab_off[a]:olab_off[a+1] indexes olab_val).
        """
        lib = _load()
        res = lib.okt_fst_to_csr(self._h)
        if not res:
            raise KaldiError("native fst_to_csr failed")
        try:
            sizes = np.zeros(5, np.int32)
            lib.okt_csr_sizes(res, _p32(sizes))
            S, A, n_ol, n_fol, start = (int(x) for x in sizes)
            row_ptr = np.zeros(S + 1, np.int32)
            tid = np.zeros(A, np.int32)
            weight = np.zeros(A, np.float32)
            nextstate = np.zeros(A, np.int32)
            final_weight = np.zeros(S, np.float32)
            olab_off = np.zeros(A + 1, np.int32)
            olab_val = np.zeros(max(n_ol, 1), np.int32)
            folab_off = np.zeros(S + 1, np.int32)
            folab_val = np.zeros(max(n_fol, 1), np.int32)
            lib.okt_csr_export(
                res, _p32(row_ptr), _p32(tid), _pf(weight), _p32(nextstate),
                _pf(final_weight), _p32(olab_off), _p32(olab_val),
                _p32(folab_off), _p32(folab_val),
            )
        finally:
            lib.okt_csr_destroy(res)
        return (start, row_ptr, tid, weight, nextstate, final_weight,
                olab_off, olab_val[:n_ol], folab_off, folab_val[:n_fol])
