"""HCLG construction and per-utterance training graphs.

Parity with reference utils/mkgraph.sh (SURVEY.md §3.1) and
src/decoder/training-graph-compiler.{h,cc}:

  LG   = pushspecial(minimizeencoded(determinizestar(L_disambig ∘ G, log)))
  CLG  = composecontext(LG, N, P)            [+ ilabel_info]
  Ha   = make-h-transducer(ilabel_info, tree, model)
  HCLGa= minimizeencoded(rmepslocal(rmsymbols(determinizestar(Ha ∘ CLG))))
  HCLG = add-self-loops(HCLGa, self_loop_scale)

Training graphs run the same pipeline with G = linear acceptor over the
transcript (optional silence comes from L), with transition_scale=1.0 and
self_loop_scale defaulting to the training convention.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

from old_kaldi_git_tpu.fst import native
from old_kaldi_git_tpu.fst.algorithms import (
    compose as compose_py,
    determinize_star as determinize_star_py,
    minimize_encoded as minimize_encoded_py,
    push_special,
    remove_eps_local,
    rm_symbols,
)


def compose(a, b, connect: bool = True):
    """Native C++ when built (4-5x faster on large graphs), Python otherwise."""
    return native.compose(a, b) if native.available() else compose_py(a, b, connect)


def determinize_star(fst, use_log: bool = False):
    if native.available():
        return native.determinize_star(fst, use_log=use_log)
    return determinize_star_py(fst, use_log=use_log)


def minimize_encoded(fst):
    if native.available():
        return native.minimize_encoded(fst)
    return minimize_encoded_py(fst)
from old_kaldi_git_tpu.fst.context import compose_context
from old_kaldi_git_tpu.fst.lang import Lang
from old_kaldi_git_tpu.fst.vector_fst import VectorFst, linear_fst
from old_kaldi_git_tpu.hmm.hmm_utils import add_self_loops, make_h_transducer
from old_kaldi_git_tpu.hmm.transition_model import TransitionModel
from old_kaldi_git_tpu.tree.context_dep import ContextDependency
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("graph")


def _build_lg(lang: Lang, g: VectorFst, use_push: bool = True) -> VectorFst:
    l_fst = lang.L_disambig.copy()
    l_fst.arcsort("olabel")
    g2 = g.copy()
    g2.arcsort("ilabel")
    lg = compose(l_fst, g2)
    lg = determinize_star(lg, use_log=True)
    lg = minimize_encoded(lg)
    if use_push:
        push_special(lg)
    return lg


def _build_hclg_from_lg(
    lg: VectorFst,
    lang: Lang,
    ctx_dep: ContextDependency,
    tm: TransitionModel,
    transition_scale: float,
    self_loop_scale: float,
) -> VectorFst:
    subseq = max(lang.phones.ids()) + 1
    clg, ilabel_info = compose_context(
        lg, ctx_dep.N, ctx_dep.P, lang.disambig_phone_ids, subseq
    )
    clg.arcsort("ilabel")
    # translate disambig entries [-ordinal] to window form the H builder
    # understands (single negative id); it only checks len==1 and <0
    ha, disambig_tids = make_h_transducer(
        ilabel_info, ctx_dep, tm, transition_scale
    )
    ha.arcsort("olabel")
    hclga = compose(ha, clg)
    hclga = determinize_star(hclga)
    rm_symbols(hclga, disambig_tids, side="input")
    remove_eps_local(hclga)
    hclga = minimize_encoded(hclga)
    hclg = add_self_loops(hclga, tm, self_loop_scale, disambig_tids=())
    hclg.connect()
    return hclg


def mkgraph(
    lang: Lang,
    g: VectorFst,
    ctx_dep: ContextDependency,
    tm: TransitionModel,
    transition_scale: float = 1.0,
    self_loop_scale: float = 0.1,
) -> VectorFst:
    """Full decode-graph build (reference utils/mkgraph.sh)."""
    lg = _build_lg(lang, g)
    log.info("mkgraph: LG has %d states / %d arcs", lg.num_states, lg.num_arcs)
    hclg = _build_hclg_from_lg(lg, lang, ctx_dep, tm, transition_scale, self_loop_scale)
    log.info("mkgraph: HCLG has %d states / %d arcs", hclg.num_states, hclg.num_arcs)
    return hclg


def mkgraph_csr(
    lang: Lang,
    g: VectorFst,
    ctx_dep: ContextDependency,
    tm: TransitionModel,
    transition_scale: float = 1.0,
    self_loop_scale: float = 0.1,
    split_eps: bool = False,
    fst_out: Optional[str] = None,
):
    """mkgraph straight to decoder CSR form, entirely on native handles
    when the C++ library is built (the only path that scales to 20k-word
    trigram HCLGs with millions of states — Python VectorFst objects per
    arc would need tens of GB).  Falls back to the Python pipeline.

    split_eps=True exports the backoff-shaped split-eps CSR (emitting
    arcs un-duplicated + per-state backoff arc; decoder runs bounded
    backoff-hop rounds) when the graph qualifies — 4.7x fewer arcs than
    the folded export on the minilib chain HCLG; falls back to folded if
    the eps structure is not backoff-shaped.

    Equivalence with mkgraph + fst_to_csr is tested on small systems
    (tests/test_fst.py)."""
    from old_kaldi_git_tpu.decoder.csr import (
        fst_to_csr,
        fst_to_csr_native,
        fst_to_split_csr_arrays,
    )
    from old_kaldi_git_tpu.fst.native import NativeFst
    from old_kaldi_git_tpu.utils.log import KaldiError

    if not native.available():
        hclg_py = mkgraph(lang, g, ctx_dep, tm, transition_scale,
                          self_loop_scale)
        if fst_out:
            from old_kaldi_git_tpu.fst.kaldi_fst_io import (
                write_fst_kaldi_file,
            )

            write_fst_kaldi_file(fst_out, hclg_py)
        if split_eps:
            try:
                return _split_csr_from_vector_fst(
                    hclg_py, tm.tid_to_pdf_array())
            except KaldiError as e:
                log.warning("split-eps export failed (%s); folding", e)
        return fst_to_csr(hclg_py, tm.tid_to_pdf_array())
    lg = NativeFst.from_vector_fst(lang.L_disambig).compose(
        NativeFst.from_vector_fst(g))
    lg = lg.determinize_star(use_log=True)
    lg = lg.minimize_encoded()
    lg.push_special()
    log.info("mkgraph: LG has %d states / %d arcs", lg.num_states, lg.num_arcs)
    subseq = max(lang.phones.ids()) + 1
    clg, ilabel_info = lg.compose_context(
        ctx_dep.N, ctx_dep.P, lang.disambig_phone_ids, subseq)
    del lg
    log.info("mkgraph: CLG has %d states / %d arcs (%d ilabels)",
             clg.num_states, clg.num_arcs, len(ilabel_info))
    ha, disambig_tids = make_h_transducer(
        ilabel_info, ctx_dep, tm, transition_scale)
    hclga = NativeFst.from_vector_fst(ha).compose(clg)
    del clg
    hclga = hclga.determinize_star()
    hclga.rm_symbols(disambig_tids, side="input")
    hclga.remove_eps_local()
    hclga = hclga.minimize_encoded()
    hclg = hclga.add_self_loops(tm, self_loop_scale)
    del hclga
    hclg.connect()
    log.info("mkgraph: HCLG has %d states / %d arcs",
             hclg.num_states, hclg.num_arcs)
    # one raw export serves both the on-disk write and the split-eps
    # CSR build (each is a full copy of the arc arrays — hundreds of MB
    # at million-state scale)
    raw = hclg.to_raw_arrays() if (fst_out or split_eps) else None
    if fst_out:
        # upstream on-disk HCLG.fst (OpenFst VectorFst<StdArc> bytes,
        # reference kaldi-fst-io.cc WriteFstKaldi) straight from the raw
        # native arrays — vectorized, seconds at million-state scale
        from old_kaldi_git_tpu.fst.kaldi_fst_io import (
            write_fst_kaldi_arrays,
        )

        with open(fst_out, "wb") as fh:
            write_fst_kaldi_arrays(fh, *raw)
        log.info("mkgraph: wrote %s (%d bytes)", fst_out,
                 os.path.getsize(fst_out))
    if split_eps:
        try:
            return fst_to_split_csr_arrays(*raw, tm.tid_to_pdf_array())
        except KaldiError as e:
            log.warning("split-eps export failed (%s); folding", e)
    return fst_to_csr_native(hclg, tm.tid_to_pdf_array())


def _split_csr_from_vector_fst(fst: VectorFst, tid_to_pdf):
    """Split-eps CSR from a Python VectorFst (small-graph fallback)."""
    import numpy as np

    from old_kaldi_git_tpu.decoder.csr import fst_to_split_csr_arrays
    from old_kaldi_git_tpu.fst.vector_fst import INF

    n = fst.num_states
    counts = np.asarray([len(a) for a in fst.arcs], np.int64)
    row_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    a_total = int(row_ptr[-1])
    il = np.zeros(a_total, np.int32)
    ol = np.zeros(a_total, np.int32)
    w = np.zeros(a_total, np.float32)
    ns = np.zeros(a_total, np.int32)
    i = 0
    for lst in fst.arcs:
        for a in lst:
            il[i], ol[i], w[i], ns[i] = (a.ilabel, a.olabel, a.weight,
                                         a.nextstate)
            i += 1
    finals = np.asarray(
        [f if f != INF else np.inf for f in fst.finals], np.float32)
    return fst_to_split_csr_arrays(
        fst.start, row_ptr.astype(np.int32), il, ol, w, ns, finals,
        tid_to_pdf)


class GraphCompiler:
    """Per-utterance training graphs (reference TrainingGraphCompiler)."""

    def __init__(
        self,
        lang: Lang,
        ctx_dep: ContextDependency,
        tm: TransitionModel,
        transition_scale: float = 1.0,
        self_loop_scale: float = 0.1,
    ):
        self.lang = lang
        self.ctx_dep = ctx_dep
        self.tm = tm
        self.transition_scale = transition_scale
        self.self_loop_scale = self_loop_scale
        self._l_native = None  # cached native handle of L_disambig
        self._l_sorted = None  # cached olabel-arcsorted L (python path)
        self._tid2pdf = None

    def _word_ids(self, words: Sequence[str]) -> List[int]:
        missing = [w for w in words if w not in self.lang.words]
        if missing:
            raise KaldiError(f"words not in lexicon: {missing}")
        return [self.lang.words[w] for w in words]

    def compile_graph_from_text(self, words: Sequence[str]) -> VectorFst:
        word_ids = self._word_ids(words)
        g = linear_fst(word_ids)
        g.arcsort("ilabel")
        if self._l_sorted is None:
            # L is ~140k arcs at 20k-word scale: copy + arcsort ONCE,
            # not per utterance (the copy dominated the compile wall)
            self._l_sorted = self.lang.L_disambig.copy()
            self._l_sorted.arcsort("olabel")
        lg = compose(self._l_sorted, g)
        lg = determinize_star(lg, use_log=True)
        lg = minimize_encoded(lg)
        return _build_hclg_from_lg(
            lg, self.lang, self.ctx_dep, self.tm,
            self.transition_scale, self.self_loop_scale,
        )

    def compile_csr_from_text(self, words: Sequence[str]):
        """Training graph straight to decoder CSR form, entirely on
        native C++ handles with the L operand converted ONCE (reference
        TrainingGraphCompiler::CompileGraphFromText; the Python
        VectorFst round trip per stage was ~350 ms/utterance at
        20k-word-lexicon scale — this path is ~10x faster).  Falls back
        to the Python pipeline when the native library is absent."""
        from old_kaldi_git_tpu.decoder.csr import (
            fst_to_csr,
            fst_to_csr_native,
        )

        if self._tid2pdf is None:
            self._tid2pdf = self.tm.tid_to_pdf_array()
        if not native.available():
            return fst_to_csr(
                self.compile_graph_from_text(words), self._tid2pdf)
        import numpy as np

        from old_kaldi_git_tpu.fst.native import NativeFst

        word_ids = self._word_ids(words)
        if self._l_native is None:
            self._l_native = NativeFst.from_vector_fst(self.lang.L_disambig)
        # linear acceptor over the transcript, straight to arrays
        n = len(word_ids) + 1
        row_ptr = np.minimum(np.arange(n + 1, dtype=np.int32), n - 1)
        lab = np.asarray(word_ids, np.int32)
        finals = np.full(n, np.inf, np.float32)
        finals[n - 1] = 0.0
        g = NativeFst.from_arrays(
            0, row_ptr, lab, lab, np.zeros(n - 1, np.float32),
            np.arange(1, n, dtype=np.int32), finals)
        lg = self._l_native.compose(g)
        lg = lg.determinize_star(use_log=True).minimize_encoded()
        subseq = max(self.lang.phones.ids()) + 1
        clg, ilabel_info = lg.compose_context(
            self.ctx_dep.N, self.ctx_dep.P,
            self.lang.disambig_phone_ids, subseq)
        del lg
        ha, disambig_tids = make_h_transducer(
            ilabel_info, self.ctx_dep, self.tm, self.transition_scale)
        hclga = NativeFst.from_vector_fst(ha).compose(clg)
        del clg
        hclga = hclga.determinize_star()
        hclga.rm_symbols(disambig_tids, side="input")
        hclga.remove_eps_local()
        hclga = hclga.minimize_encoded()
        hclg = hclga.add_self_loops(self.tm, self.self_loop_scale)
        del hclga
        hclg.connect()
        return fst_to_csr_native(hclg, self._tid2pdf)

    def compile_graphs(self, transcripts) -> List[VectorFst]:
        return [self.compile_graph_from_text(t) for t in transcripts]

    def compile_csr_graphs(self, transcripts) -> List:
        return [self.compile_csr_from_text(t) for t in transcripts]


def compile_training_graphs(
    lang: Lang,
    ctx_dep: ContextDependency,
    tm: TransitionModel,
    transcripts,
    **kw,
) -> List[VectorFst]:
    return GraphCompiler(lang, ctx_dep, tm, **kw).compile_graphs(transcripts)
