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
    """Emitting-arc CSR. Device arrays are plain numpy here; the decoder
    moves them to the device once per graph.

    Two epsilon regimes (reference ProcessNonemitting re-shaped two ways):

      * FOLDED (default): eps arcs are eliminated up front by closure
        forwarding — every arc's weight/olabels include its eps prefix.
        Exact, but duplicates a backoff state's arcs into every
        predecessor (the chain/backoff-heavy graphs blow up 4-5x).
      * SPLIT (eps_ns is not None): arcs here are the emitting arcs ONLY;
        each state additionally carries at most one eps "backoff" arc
        (eps_ns/eps_w/eps_olab, eps_ns < 0 = none), and the decoder runs
        `eps_depth` bounded backoff-hop merge rounds per frame.  Only
        valid when every state has <= 1 eps out-arc (LM-backoff shape);
        final_weight/final_olabels stay closure-folded."""

    start: int
    row_ptr: np.ndarray  # [S+1] int32
    tid: np.ndarray  # [A] int32 (transition-id, input label)
    pdf: np.ndarray  # [A] int32 (acoustic gather index)
    weight: np.ndarray  # [A] float32 (graph cost incl. folded eps prefix)
    nextstate: np.ndarray  # [A] int32
    final_weight: np.ndarray  # [S] float32 (+inf = not final)
    arc_olabels: List[Tuple[int, ...]]  # per arc: word ids along eps prefix + arc
    final_olabels: List[Tuple[int, ...]]  # per state: words on best eps path to final
    # split-eps regime (None in the folded regime):
    eps_ns: Optional[np.ndarray] = None   # [S] int32 backoff target, -1 = none
    eps_w: Optional[np.ndarray] = None    # [S] float32 backoff weight
    eps_olab: Optional[np.ndarray] = None  # [S] int32 word on backoff arc, 0 = none
    eps_depth: int = 0                    # max backoff-chain length

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
    # per-utterance training graphs would spam one line each: only the
    # shared decode-graph scale is worth an info line
    lvl = log.info if csr.num_arcs >= 100_000 else log.debug
    lvl(
        "csr(native): %d states, %d arcs (max out-degree %d)",
        csr.num_states, csr.num_arcs, csr.max_out_degree,
    )
    return csr


def fst_to_split_csr_arrays(
    start: int,
    row_ptr: np.ndarray,
    il: np.ndarray,
    ol: np.ndarray,
    w: np.ndarray,
    ns: np.ndarray,
    finals: np.ndarray,
    tid_to_pdf: np.ndarray,
    max_depth: int = 8,
) -> CsrGraph:
    """Build a SPLIT-eps CsrGraph from raw FST arrays (il 0 = eps).

    Requires every state to have <= 1 eps out-arc and acyclic eps chains
    of depth <= max_depth (the LM-backoff shape: trigram state ->
    bigram -> unigram).  Raises KaldiError otherwise — callers fall back
    to the folded export.  Emitting arcs stay un-duplicated (the folded
    export copies a backoff state's arcs into every predecessor — 4.7x
    arc blowup measured on the minilib chain HCLG); the decoder instead
    runs `eps_depth` backoff-hop merge rounds per frame
    (viterbi._decode_scan_tokens)."""
    S = len(row_ptr) - 1
    deg = np.diff(row_ptr)
    src = np.repeat(np.arange(S, dtype=np.int64), deg)
    eps = il == 0
    eps_out = np.bincount(src[eps], minlength=S)
    if eps_out.max(initial=0) > 1:
        raise KaldiError(
            f"split-eps export needs <=1 eps out-arc per state "
            f"(max {int(eps_out.max())})")
    eps_ns = np.full(S, -1, np.int32)
    eps_w = np.full(S, np.float32(1e10), np.float32)
    eps_olab = np.zeros(S, np.int32)
    es = src[eps]
    eps_ns[es] = ns[eps]
    eps_w[es] = w[eps]
    eps_olab[es] = ol[eps]
    # depth + acyclicity
    depth = 0
    cur = eps_ns.astype(np.int64)
    while (cur >= 0).any():
        depth += 1
        if depth > max_depth:
            raise KaldiError(
                f"eps chains deeper than {max_depth} (cycle?)")
        m = cur >= 0
        nxt = np.full(S, -1, np.int64)
        nxt[m] = eps_ns[cur[m]]
        cur = nxt
    # emitting CSR
    keep = ~eps
    e_src = src[keep]
    e_il = il[keep].astype(np.int32)
    e_ol = ol[keep].astype(np.int32)
    e_w = w[keep].astype(np.float32)
    e_ns = ns[keep].astype(np.int32)
    order = np.argsort(e_src, kind="stable")
    e_src, e_il, e_ol = e_src[order], e_il[order], e_ol[order]
    e_w, e_ns = e_w[order], e_ns[order]
    new_deg = np.bincount(e_src, minlength=S)
    new_rp = np.zeros(S + 1, np.int64)
    np.cumsum(new_deg, out=new_rp[1:])
    has = e_ol != 0
    olab_off = np.zeros(len(e_il) + 1, np.int64)
    np.cumsum(has.astype(np.int64), out=olab_off[1:])
    arc_olabels = FlatOlabels(olab_off.astype(np.int32),
                              e_ol[has].astype(np.int32))
    # closure-folded final weights (the eps chain is a path, so the best
    # completion is an argmin over <= depth+1 prefix candidates)
    fin = np.where(np.isfinite(finals), finals, np.inf).astype(np.float64)
    cand = np.full((depth + 1, S), np.inf)
    cand[0] = fin
    cum = np.zeros(S)
    u = np.arange(S, dtype=np.int64)
    alive = np.ones(S, bool)
    for k in range(1, depth + 1):
        alive = alive & (eps_ns[np.maximum(u, 0)] >= 0) & (u >= 0)
        step_w = np.where(alive, eps_w[np.maximum(u, 0)], np.inf)
        cum = cum + step_w
        u = np.where(alive, eps_ns[np.maximum(u, 0)], -1)
        cand[k] = np.where(alive, cum + fin[np.maximum(u, 0)], np.inf)
    best_k = np.argmin(cand, axis=0)
    fw_folded = cand[best_k, np.arange(S)]
    final_olabels: List[Tuple[int, ...]] = [()] * S
    for s in np.nonzero((best_k > 0) & np.isfinite(fw_folded))[0]:
        labs: List[int] = []
        u2 = int(s)
        for _ in range(int(best_k[s])):
            if eps_olab[u2]:
                labs.append(int(eps_olab[u2]))
            u2 = int(eps_ns[u2])
        final_olabels[int(s)] = tuple(labs)
    csr = CsrGraph(
        start=int(start),
        row_ptr=new_rp.astype(np.int32),
        tid=e_il,
        pdf=tid_to_pdf[e_il].astype(np.int32) if len(e_il) else e_il.copy(),
        weight=e_w,
        nextstate=e_ns,
        final_weight=np.where(
            np.isfinite(fw_folded), fw_folded, np.inf).astype(np.float32),
        arc_olabels=arc_olabels,
        final_olabels=final_olabels,
        eps_ns=eps_ns,
        eps_w=eps_w,
        eps_olab=eps_olab,
        eps_depth=depth,
    )
    csr._olabel_mask = has
    log.info(
        "csr(split-eps): %d states, %d emit arcs + %d backoff arcs "
        "(depth %d, max emit out-degree %d)",
        S, csr.num_arcs, int((eps_ns >= 0).sum()), depth,
        csr.max_out_degree,
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
