"""CSR arc-tensor form of a decoding/training graph.

The TPU decoder consumes graphs as padded CSR arrays (SURVEY.md §7.1:
"HCLG in padded CSR").  Epsilon arcs are eliminated up front by forwarding:
every state's outgoing arc set becomes { eps-closure ∘ emitting arc }, with
closure weights folded in and the closure's output labels remembered on the
CPU side for word recovery (the reference's ProcessNonemitting done once at
compile time instead of per frame).
"""

from __future__ import annotations

import dataclasses
import heapq
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from old_kaldi_git_tpu.fst.vector_fst import EPS, INF, VectorFst
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("csr")


@dataclasses.dataclass
class CsrGraph:
    """Eps-free emitting-arc CSR. Device arrays are plain numpy here; the
    decoder moves them to the device once per graph."""

    start: int
    row_ptr: np.ndarray  # [S+1] int32
    tid: np.ndarray  # [A] int32 (transition-id, input label)
    pdf: np.ndarray  # [A] int32 (acoustic gather index)
    weight: np.ndarray  # [A] float32 (graph cost incl. folded eps prefix)
    nextstate: np.ndarray  # [A] int32
    final_weight: np.ndarray  # [S] float32 (+inf = not final)
    arc_olabels: List[Tuple[int, ...]]  # per arc: word ids along eps prefix + arc
    final_olabels: List[Tuple[int, ...]]  # per state: words on best eps path to final

    @property
    def num_states(self) -> int:
        return len(self.row_ptr) - 1

    @property
    def num_arcs(self) -> int:
        return len(self.tid)

    @property
    def max_out_degree(self) -> int:
        return int(np.max(self.row_ptr[1:] - self.row_ptr[:-1])) if self.num_states else 0

    def out_degree(self) -> np.ndarray:
        return (self.row_ptr[1:] - self.row_ptr[:-1]).astype(np.int32)



@dataclasses.dataclass
class TileGraph:
    """Per-state MD-arc tile layout of a CsrGraph for the token-sparse
    decoder: every state's out-arcs are padded to a multiple of `md` and
    stored as [Ntile, md, 3] int32 rows (weight f32 bitcast, pdf,
    nextstate).  One device gather per active TOKEN then pulls a whole
    tile — chip-measured 3.2x cheaper than one gather per expanded arc
    at decode shape (benchmarks/gather_variants_bench.py: 2.56 vs 8.09
    ms/frame at [64, 11904], because XLA's TPU gather prices per index,
    not per byte).  Padding arcs carry weight=BIG so their candidates
    cost >= BIG and die at the beam/keep gate.

    Padded arc id = tile_id * md + lane; `pad2orig` maps it back to the
    CsrGraph arc id (-1 on padding) so every id that leaves the decoder
    still refers to the original graph."""

    md: int
    tile_ptr: np.ndarray   # [S+1] int32 cumulative tiles per state
    tiles: np.ndarray      # [Ntile, md, 3] int32 (w bitcast, pdf, ns)
    pad2orig: np.ndarray   # [Ntile*md] int32, -1 = padding
    frm_pad: np.ndarray    # [Ntile*md] int32 source state (0 on padding)

    @property
    def num_tiles(self) -> int:
        return len(self.tiles)

    def device_arrays(self):
        """(tile_ptr, tiles, frm_pad) as device arrays, uploaded ONCE and
        cached — re-uploading ~80 MB of tile tables per decode chunk
        through the tunneled device link costs seconds."""
        if not hasattr(self, "_dev"):
            import jax.numpy as jnp

            self._dev = (jnp.asarray(self.tile_ptr), jnp.asarray(self.tiles),
                         jnp.asarray(self.frm_pad))
        return self._dev


def build_tile_graph(graph: CsrGraph, md: int = 4,
                     big: float = 1e10) -> TileGraph:
    """Build (and cache on the graph) the MD-arc tile layout."""
    cached = getattr(graph, "_tile_graph", None)
    if cached is not None and cached.md == md:
        return cached
    deg = graph.out_degree().astype(np.int64)
    ntiles = -(-deg // md)  # ceil, 0 for dead states
    tile_ptr = np.zeros(len(deg) + 1, np.int64)
    np.cumsum(ntiles, out=tile_ptr[1:])
    ntile = int(tile_ptr[-1])
    ap = ntile * md
    w = np.full(ap, big, np.float32)
    pdf = np.zeros(ap, np.int32)
    ns = np.zeros(ap, np.int32)
    pad2orig = np.full(ap, -1, np.int32)
    frm_pad = np.zeros(ap, np.int32)
    # padded slot of arc i (state s, offset o) = (tile_ptr[s]*md) + o
    src = np.repeat(np.arange(graph.num_states, dtype=np.int64), deg)
    off = np.arange(graph.num_arcs, dtype=np.int64) - np.repeat(
        graph.row_ptr[:-1].astype(np.int64), deg)
    slot = tile_ptr[src] * md + off
    w[slot] = graph.weight
    pdf[slot] = graph.pdf
    ns[slot] = graph.nextstate
    pad2orig[slot] = np.arange(graph.num_arcs, dtype=np.int32)
    frm_pad[slot] = src.astype(np.int32)
    tiles = np.empty((ntile, md, 3), np.int32)
    tiles[:, :, 0] = w.view(np.int32).reshape(ntile, md)
    tiles[:, :, 1] = pdf.reshape(ntile, md)
    tiles[:, :, 2] = ns.reshape(ntile, md)
    tg = TileGraph(
        md=md,
        tile_ptr=tile_ptr.astype(np.int32),
        tiles=tiles,
        pad2orig=pad2orig,
        frm_pad=frm_pad,
    )
    graph._tile_graph = tg
    log.info(
        "tiles(md=%d): %d states / %d arcs -> %d tiles (%.0f%% pad)",
        md, graph.num_states, graph.num_arcs, ntile,
        100.0 * (ap - graph.num_arcs) / max(1, ap),
    )
    return tg


class FlatOlabels:
    """Per-arc (or per-state) output-label runs stored as flat (offsets,
    values) arrays — tuple-list protocol without millions of Python tuples
    (the native CSR export path for large graphs)."""

    __slots__ = ("offsets", "values")

    def __init__(self, offsets: np.ndarray, values: np.ndarray):
        self.offsets = offsets
        self.values = values

    def __len__(self):
        return len(self.offsets) - 1

    def __getitem__(self, i):
        return tuple(self.values[self.offsets[i]:self.offsets[i + 1]].tolist())

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def fst_to_csr_native(nfst, tid_to_pdf: np.ndarray) -> CsrGraph:
    """CSR conversion on a native handle (fst/native.py NativeFst) — same
    semantics as fst_to_csr but never materializes Python arc objects."""
    (start, row_ptr, tid, weight, nextstate, final_weight, olab_off,
     olab_val, folab_off, folab_val) = nfst.to_csr_arrays()
    csr = CsrGraph(
        start=start,
        row_ptr=row_ptr,
        tid=tid,
        pdf=tid_to_pdf[tid].astype(np.int32) if len(tid) else tid.copy(),
        weight=weight,
        nextstate=nextstate,
        final_weight=np.where(
            np.isfinite(final_weight), final_weight, np.inf
        ).astype(np.float32),
        arc_olabels=FlatOlabels(olab_off, olab_val),
        final_olabels=FlatOlabels(folab_off, folab_val),
    )
    csr._olabel_mask = (olab_off[1:] > olab_off[:-1])
    log.info(
        "csr(native): %d states, %d arcs (max out-degree %d)",
        csr.num_states, csr.num_arcs, csr.max_out_degree,
    )
    return csr


def _eps_closure(
    fst: VectorFst, s: int
) -> List[Tuple[int, float, Tuple[int, ...]]]:
    """Dijkstra over eps-input arcs from s: [(state, weight, olabels)] with
    min weight per reachable state; olabels follow the argmin path."""
    dist: Dict[int, float] = {s: 0.0}
    lab: Dict[int, Tuple[int, ...]] = {s: ()}
    heap: List[Tuple[float, int]] = [(0.0, s)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u] + 1e-12:
            continue
        for a in fst.arcs[u]:
            if a.ilabel != EPS:
                continue
            nd = d + a.weight
            if nd < dist.get(a.nextstate, INF) - 1e-12:
                dist[a.nextstate] = nd
                lab[a.nextstate] = lab[u] + ((a.olabel,) if a.olabel != EPS else ())
                heapq.heappush(heap, (nd, a.nextstate))
    return [(u, dist[u], lab[u]) for u in dist]


def fst_to_csr(fst: VectorFst, tid_to_pdf: np.ndarray) -> CsrGraph:
    """Convert an HCLG/training graph (input labels = tids, 0 = eps) to
    eps-forwarded CSR.  tid_to_pdf: int32 [num_tids+1] (from TransitionModel).
    """
    if fst.start < 0:
        raise KaldiError("fst has no start state")
    S = fst.num_states
    rows: List[List[Tuple[int, int, float, int, Tuple[int, ...]]]] = []
    final_weight = np.full(S, np.inf, dtype=np.float32)
    final_olabels: List[Tuple[int, ...]] = [()] * S
    for s in range(S):
        closure = _eps_closure(fst, s)
        arcs_out: Dict[Tuple[int, int], Tuple[float, Tuple[int, ...]]] = {}
        best_final = INF
        best_final_lab: Tuple[int, ...] = ()
        for u, w_eps, olab in closure:
            if fst.finals[u] != INF and w_eps + fst.finals[u] < best_final:
                best_final = w_eps + fst.finals[u]
                best_final_lab = olab
            for a in fst.arcs[u]:
                if a.ilabel == EPS:
                    continue
                w = w_eps + a.weight
                labs = olab + ((a.olabel,) if a.olabel != EPS else ())
                key = (a.ilabel, a.nextstate)
                # keep best-weight duplicate (same tid & dest via different
                # eps prefixes)
                if key not in arcs_out or w < arcs_out[key][0]:
                    arcs_out[key] = (w, labs)
        rows.append(
            [(il, int(tid_to_pdf[il]), w, ns, labs)
             for (il, ns), (w, labs) in sorted(arcs_out.items())]
        )
        if best_final != INF:
            final_weight[s] = best_final
            final_olabels[s] = best_final_lab

    row_ptr = np.zeros(S + 1, dtype=np.int32)
    for s in range(S):
        row_ptr[s + 1] = row_ptr[s] + len(rows[s])
    A = int(row_ptr[-1])
    tid = np.zeros(A, dtype=np.int32)
    pdf = np.zeros(A, dtype=np.int32)
    weight = np.zeros(A, dtype=np.float32)
    nextstate = np.zeros(A, dtype=np.int32)
    arc_olabels: List[Tuple[int, ...]] = [()] * A
    i = 0
    for s in range(S):
        for il, p, w, ns, labs in rows[s]:
            tid[i] = il
            pdf[i] = p
            weight[i] = w
            nextstate[i] = ns
            arc_olabels[i] = labs
            i += 1
    csr = CsrGraph(
        start=fst.start,
        row_ptr=row_ptr,
        tid=tid,
        pdf=pdf,
        weight=weight,
        nextstate=nextstate,
        final_weight=final_weight,
        arc_olabels=arc_olabels,
        final_olabels=final_olabels,
    )
    log.debug(
        "csr: %d states, %d arcs (max out-degree %d)",
        csr.num_states, csr.num_arcs, csr.max_out_degree,
    )
    return csr
