"""MLE estimation for diagonal GMMs.

Parity with reference src/gmm/{mle-diag-gmm.h,mle-am-diag-gmm.h}:
AccumAmDiagGmm (occupancy/mean/var sufficient statistics, flags "mvw"),
MleDiagGmmUpdate (with variance flooring and min-gaussian-occupancy), and
mixture splitting (gmm-mixup).

The accumulation hot path is a JAX segment-sum over frames (SURVEY.md §2.8
P2: map-reduce sufficient statistics → psum across the data axis); the
M-step is small host-side numpy.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("gmm")


@options_dataclass
class MleDiagGmmOptions:
    min_gaussian_occupancy: float = 10.0
    min_gaussian_weight: float = 1e-5
    variance_floor: float = 1e-3
    remove_low_count_gaussians: bool = True


class AccumAmDiagGmm:
    """Per-(pdf, mixture) occupancy/mean/var stats, padded [P, M, D]."""

    def __init__(self, am: AmDiagGmm):
        P = am.num_pdfs
        M = max(p.num_mix for p in am.pdfs)
        D = am.dim
        self.occ = np.zeros((P, M))
        self.mean_acc = np.zeros((P, M, D))
        self.var_acc = np.zeros((P, M, D))
        self.tot_like = 0.0
        self.tot_frames = 0.0

    def accumulate(
        self, am: AmDiagGmm, feats: np.ndarray, pdf_ids: Sequence[int],
        weights: Optional[np.ndarray] = None,
    ) -> float:
        """Hard-alignment accumulation: frame t belongs to pdf_ids[t]; the
        per-mixture split uses component posteriors (reference
        AccumulateFromDiagGmm)."""
        feats = np.asarray(feats, np.float64)
        pdf_ids = np.asarray(pdf_ids)
        w = np.ones(len(feats)) if weights is None else np.asarray(weights)
        like = 0.0
        for pdf in np.unique(pdf_ids):
            sel = pdf_ids == pdf
            x = feats[sel]
            ww = w[sel]
            gmm = am.pdfs[pdf]
            post = gmm.posteriors(x) * ww[:, None]  # [t, m]
            like += float((gmm.loglikes(x) * ww).sum())
            m = gmm.num_mix
            self.occ[pdf, :m] += post.sum(axis=0)
            self.mean_acc[pdf, :m] += post.T @ x
            self.var_acc[pdf, :m] += post.T @ (x**2)
        self.tot_like += like
        self.tot_frames += float(w.sum())
        return like

    def accumulate_corpus(
        self, am: AmDiagGmm, feats: np.ndarray, pdf_ids: np.ndarray,
        weights: Optional[np.ndarray] = None, chunk: int = 65536,
    ) -> float:
        """Vectorized whole-corpus accumulation: feats [N, D] (all frames
        concatenated), pdf_ids [N].  Same statistics as per-utterance
        accumulate() (fp addition order differs), without the
        (utts × unique-pdfs) Python-loop overhead — the GMM stages'
        accumulate phase was ~8% of minilib build wall (r4 profile).

        Sorts frames by pdf and reduces each pdf segment with one einsum;
        per-frame component loglikes use the padded [P, M, ...] natural
        parameters gathered per frame (chunked to bound the [n, M, D]
        intermediates)."""
        feats = np.asarray(feats, np.float64)
        pdf_ids = np.asarray(pdf_ids, np.int64)
        N, D = feats.shape
        w = (np.ones(N) if weights is None
             else np.asarray(weights, np.float64))
        order = np.argsort(pdf_ids, kind="stable")
        xs = feats[order]
        ps = pdf_ids[order]
        ws = w[order]
        like = 0.0
        # one exact-size BLAS pass per OCCUPIED pdf over the sorted
        # corpus: ≤ num_pdfs Python iterations total (vs utts×pdfs for
        # the per-utterance path), no max-mix padding waste (a padded
        # [n, M, D] gather costs M/mean_mix extra flops — measured
        # SLOWER than the per-utterance loop at minilib tri scale where
        # mean_mix=1.4, M=8), and only [segment, m] posteriors are ever
        # materialized (chunk bounds the segment block size)
        uniq, starts = np.unique(ps, return_index=True)
        ends = np.append(starts[1:], N)
        for pdf, a0, b0 in zip(uniq, starts, ends):
            g = am.pdfs[int(pdf)]
            m = g.num_mix
            gc = g.gconsts
            miv = g.means_invvars
            iv = g.inv_vars
            for a in range(int(a0), int(b0), chunk):
                b = min(int(b0), a + chunk)
                x = xs[a:b]
                ww = ws[a:b]
                comp = gc[None, :] + x @ miv.T - 0.5 * (x * x) @ iv.T
                cmax = comp.max(axis=1, keepdims=True)
                e = np.exp(comp - cmax)
                tot = e.sum(axis=1, keepdims=True)
                like += float(((cmax[:, 0] + np.log(tot[:, 0])) * ww)
                              .sum())
                post = e / tot * ww[:, None]
                self.occ[pdf, :m] += post.sum(axis=0)
                self.mean_acc[pdf, :m] += post.T @ x
                self.var_acc[pdf, :m] += post.T @ (x * x)
        self.tot_like += like
        self.tot_frames += float(w.sum())
        return like

    def add(self, other: "AccumAmDiagGmm") -> None:
        self.occ += other.occ
        self.mean_acc += other.mean_acc
        self.var_acc += other.var_acc
        self.tot_like += other.tot_like
        self.tot_frames += other.tot_frames


class AccumDiagGmm:
    """Single-GMM sufficient statistics (the gmm-global-* tool family:
    reference mle-diag-gmm.h AccumDiagGmm used standalone, with optional
    Gaussian preselection as in gmm-global-acc-stats + --gselect)."""

    def __init__(self, num_mix: int, dim: int):
        self.occ = np.zeros(num_mix, np.float64)
        self.mean_acc = np.zeros((num_mix, dim), np.float64)
        self.var_acc = np.zeros((num_mix, dim), np.float64)
        self.tot_like = 0.0
        self.tot_frames = 0.0

    def accumulate(self, gmm: DiagGmm, feats: np.ndarray,
                   gsel: Optional[np.ndarray] = None,
                   weights: Optional[np.ndarray] = None) -> float:
        x = np.asarray(feats, np.float64)
        comp = gmm.component_loglikes(x)  # [T, M]
        if gsel is not None:
            masked = np.full_like(comp, -np.inf)
            np.put_along_axis(masked, gsel,
                              np.take_along_axis(comp, gsel, axis=1), axis=1)
            comp = masked
        m = comp.max(axis=1, keepdims=True)
        like = m + np.log(np.exp(comp - m).sum(axis=1, keepdims=True))
        post = np.exp(comp - like)
        w = np.ones(len(x)) if weights is None else np.asarray(weights)
        post = post * w[:, None]
        self.occ += post.sum(0)
        self.mean_acc += post.T @ x
        self.var_acc += post.T @ (x**2)
        self.tot_like += float((like[:, 0] * w).sum())
        self.tot_frames += float(w.sum())
        return float((like[:, 0] * w).sum())

    def add(self, other: "AccumDiagGmm") -> None:
        self.occ += other.occ
        self.mean_acc += other.mean_acc
        self.var_acc += other.var_acc
        self.tot_like += other.tot_like
        self.tot_frames += other.tot_frames

    def write(self, f) -> None:
        from old_kaldi_git_tpu.utils import io_funcs as iof

        iof.init_kaldi_output_stream(f, True)
        iof.write_token(f, "<GmmGlobalAccs>")
        iof.write_vector(f, self.occ, dtype=np.float64)
        iof.write_matrix(f, self.mean_acc, dtype=np.float64)
        iof.write_matrix(f, self.var_acc, dtype=np.float64)
        iof.write_double(f, self.tot_like)
        iof.write_double(f, self.tot_frames)
        iof.write_token(f, "</GmmGlobalAccs>")

    @staticmethod
    def read(f) -> "AccumDiagGmm":
        from old_kaldi_git_tpu.utils import io_funcs as iof

        if not iof.init_kaldi_input_stream(f):
            raise KaldiError("GmmGlobalAccs must be binary")
        iof.expect_token(f, "<GmmGlobalAccs>")
        occ = np.asarray(iof.read_vector(f), np.float64)
        accs = AccumDiagGmm(len(occ), 1)
        accs.occ = occ
        accs.mean_acc = np.asarray(iof.read_matrix(f), np.float64)
        accs.var_acc = np.asarray(iof.read_matrix(f), np.float64)
        accs.tot_like = iof.read_float(f)
        accs.tot_frames = iof.read_float(f)
        iof.expect_token(f, "</GmmGlobalAccs>")
        return accs


def mle_diag_gmm_update(
    gmm: DiagGmm,
    occ: np.ndarray,
    mean_acc: np.ndarray,
    var_acc: np.ndarray,
    opts: MleDiagGmmOptions,
) -> DiagGmm:
    m = gmm.num_mix
    occ = occ[:m]
    tot = occ.sum()
    if tot <= 0:
        log.warning("no occupancy for a pdf; leaving it unchanged")
        return gmm
    keep = occ >= opts.min_gaussian_occupancy
    if not keep.any():
        keep = occ == occ.max()
    if not opts.remove_low_count_gaussians:
        keep = np.ones_like(keep)
    occ_k = occ[keep]
    means = mean_acc[:m][keep] / occ_k[:, None]
    variances = var_acc[:m][keep] / occ_k[:, None] - means**2
    variances = np.maximum(variances, opts.variance_floor)
    weights = np.maximum(occ_k / tot, opts.min_gaussian_weight)
    weights = weights / weights.sum()
    return DiagGmm(weights, means, variances)


def mle_am_diag_gmm_update(
    am: AmDiagGmm, accs: AccumAmDiagGmm, opts: Optional[MleDiagGmmOptions] = None
) -> AmDiagGmm:
    opts = opts or MleDiagGmmOptions()
    new_pdfs = [
        mle_diag_gmm_update(
            am.pdfs[i], accs.occ[i], accs.mean_acc[i], accs.var_acc[i], opts
        )
        for i in range(am.num_pdfs)
    ]
    return AmDiagGmm(new_pdfs)


def mixup(am: AmDiagGmm, target_total: int, occs: Optional[np.ndarray] = None,
          perturb_factor: float = 0.01, seed: int = 0) -> AmDiagGmm:
    """Split Gaussians until the model has target_total components, allocating
    proportionally to pdf occupancy (reference gmm-mixup / DiagGmm::Split)."""
    rng = np.random.default_rng(seed)
    current = am.num_gauss
    if target_total <= current:
        return am
    occ_per_pdf = (
        occs if occs is not None else np.asarray([p.num_mix for p in am.pdfs], float)
    )
    # allocate new gaussians by largest occupancy-per-component first
    alloc = np.asarray([p.num_mix for p in am.pdfs], int)
    while alloc.sum() < target_total:
        score = occ_per_pdf / alloc
        alloc[int(score.argmax())] += 1
    new_pdfs: List[DiagGmm] = []
    for pdf, n_target in zip(am.pdfs, alloc):
        weights = list(pdf.weights)
        means = [m for m in pdf.means]
        variances = [v for v in pdf.vars]
        while len(weights) < n_target:
            i = int(np.argmax(weights))
            w = weights[i] / 2.0
            std = np.sqrt(variances[i])
            delta = perturb_factor * std * rng.normal(size=std.shape)
            weights[i] = w
            weights.append(w)
            means.append(means[i] + delta)
            means[i] = means[i] - delta
            variances.append(variances[i].copy())
        new_pdfs.append(DiagGmm(np.asarray(weights), np.asarray(means), np.asarray(variances)))
    out = AmDiagGmm(new_pdfs)
    log.info("mixup: %d → %d gaussians", current, out.num_gauss)
    return out


# ---------------------------------------------------------------------------
# accumulator files (reference gmm-acc-stats-ali writes "<GmmAccs>" objects;
# gmm-sum-accs adds them; gmm-est consumes them).  One file carries both the
# GMM stats and the transition-occupancy vector, like the reference's
# (TransitionAccs, AccumAmDiagGmm) pair.
# ---------------------------------------------------------------------------


def write_accs(f, accs: AccumAmDiagGmm, trans_stats: np.ndarray) -> None:
    from old_kaldi_git_tpu.utils import io_funcs as iof

    iof.init_kaldi_output_stream(f, True)
    iof.write_token(f, "<GmmAccs>")
    iof.write_vector(f, np.asarray(trans_stats, np.float64), dtype=np.float64)
    P, M = accs.occ.shape
    D = accs.mean_acc.shape[2]
    iof.write_int32(f, P)
    iof.write_int32(f, M)
    iof.write_int32(f, D)
    iof.write_matrix(f, accs.occ, dtype=np.float64)
    iof.write_matrix(f, accs.mean_acc.reshape(P * M, D), dtype=np.float64)
    iof.write_matrix(f, accs.var_acc.reshape(P * M, D), dtype=np.float64)
    iof.write_double(f, accs.tot_like)
    iof.write_double(f, accs.tot_frames)
    iof.write_token(f, "</GmmAccs>")


def read_accs(f):
    from old_kaldi_git_tpu.utils import io_funcs as iof

    if not iof.init_kaldi_input_stream(f):
        raise KaldiError("accs file must be binary")
    iof.expect_token(f, "<GmmAccs>")
    trans_stats = iof.read_vector(f)
    P = iof.read_int32(f)
    M = iof.read_int32(f)
    D = iof.read_int32(f)
    accs = AccumAmDiagGmm.__new__(AccumAmDiagGmm)
    accs.occ = iof.read_matrix(f)
    accs.mean_acc = iof.read_matrix(f).reshape(P, M, D)
    accs.var_acc = iof.read_matrix(f).reshape(P, M, D)
    accs.tot_like = iof.read_float(f)
    accs.tot_frames = iof.read_float(f)
    iof.expect_token(f, "</GmmAccs>")
    return accs, np.asarray(trans_stats, np.float64)


def init_am_from_tree_stats(ctx_dep, stats) -> AmDiagGmm:
    """One single-Gaussian pdf per tree leaf from the leaf's pooled stats,
    falling back to global stats for starved leaves (reference
    gmm-init-model; stats = {event → GaussClusterable})."""
    N = ctx_dep.N
    leaf_stats: List[object] = [None] * ctx_dep.num_pdfs
    for event, st in stats.items():
        d = dict(event)
        window = [d[i] for i in range(N)]
        pdf = ctx_dep.compute(window, d[-1])
        if leaf_stats[pdf] is None:
            leaf_stats[pdf] = st.copy()
        else:
            leaf_stats[pdf].add(st)
    glob = None
    for st in leaf_stats:
        if st is not None:
            if glob is None:
                glob = st.copy()
            else:
                glob.add(st)
    if glob is None or glob.count <= 0:
        raise KaldiError("init_am_from_tree_stats: no stats")
    gmean = glob.x / glob.count
    gvar = np.maximum(glob.x2 / glob.count - gmean**2, 1e-3)
    pdfs = []
    for st in leaf_stats:
        if st is not None and st.count > 3.0:
            mean = st.x / st.count
            var = np.maximum(st.x2 / st.count - mean**2, 1e-3)
        else:
            mean, var = gmean.copy(), gvar.copy()
        pdfs.append(DiagGmm(np.ones(1), mean[None, :], var[None, :]))
    return AmDiagGmm(pdfs)
