"""Regression-tree MLLR / fMLLR: per-Gaussian-cluster adaptation.

Reference parity: src/transform/regression-tree.{h,cc} (RegressionTree),
regtree-fmllr-diag-gmm.{h,cc} (RegtreeFmllrDiagGmmAccs / RegtreeFmllrDiagGmm)
and regtree-mllr-diag-gmm.{h,cc} (RegtreeMllrDiagGmmAccs / RegtreeMllrDiagGmm),
plus the gmmbin tools gmm-make-regtree, gmm-est-regtree-fmllr,
gmm-est-regtree-mllr, gmm-decode-faster-regtree-{fmllr,mllr}.

Design: a binary tree over *baseclasses* of Gaussians.  Every Gaussian of the
acoustic model is assigned to one of B baseclasses (weighted k-means on the
means, the role of the reference's GaussClusterable bottom-up clustering);
baseclasses are then merged agglomeratively into a binary tree.  Adaptation
stats are accumulated per baseclass; at estimation time each baseclass walks
up the tree to the first ancestor with enough occupancy and one transform is
estimated per such node — few-data speakers share one (near-)global
transform, data-rich speakers get many specific ones.

MLLR transforms the model means (mu' = A mu + b, per class; no Jacobian
term, closed-form row solve).  fMLLR transforms the features per class
(y = A x + b with a log|A| term, estimated with the shared iterative
row-cofactor update from transform/fmllr.py).

Host-side numpy like the other transform estimators (SURVEY.md §7.3 item 3):
these are small per-speaker solves; the heavy part (per-frame likelihoods
during decoding) stays in the batched TPU paths.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.gmm.diag_gmm import AmDiagGmm, DiagGmm
from old_kaldi_git_tpu.transform.fmllr import FmllrAccs, compute_fmllr_transform
from old_kaldi_git_tpu.utils.io_funcs import (
    expect_token,
    init_kaldi_input_stream,
    init_kaldi_output_stream,
    read_int32,
    read_int_vector,
    read_matrix,
    read_token,
    write_int32,
    write_int_vector,
    write_matrix,
    write_token,
)
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("regtree")


class RegressionTree:
    """Binary tree over Gaussian baseclasses.

    Nodes 0..B-1 are the baseclass leaves; internal nodes follow in merge
    order; the root is node 2B-2.  `parents[i]` gives each node's parent
    (root's parent is itself, matching the reference's convention).
    `gauss2bclass[pdf][mix]` maps every Gaussian to its leaf.
    """

    def __init__(self, parents: np.ndarray, gauss2bclass: List[np.ndarray],
                 num_baseclasses: int):
        self.parents = np.asarray(parents, np.int32)
        self.gauss2bclass = [np.asarray(g, np.int32) for g in gauss2bclass]
        self.num_baseclasses = int(num_baseclasses)

    @property
    def num_nodes(self) -> int:
        return len(self.parents)

    @property
    def root(self) -> int:
        return self.num_nodes - 1

    # -- construction ---------------------------------------------------------
    @staticmethod
    def build(am: AmDiagGmm, num_baseclasses: int = 32,
              seed: int = 0, kmeans_iters: int = 20) -> "RegressionTree":
        """Cluster all Gaussians into `num_baseclasses` leaves (weighted
        k-means on means, variance-normalized), then merge leaves
        agglomeratively into a binary tree (gmm-make-regtree role)."""
        means, weights, owners = [], [], []
        for p, gmm in enumerate(am.pdfs):
            means.append(gmm.means)
            weights.append(gmm.weights)
            owners.append(np.full(gmm.num_mix, p))
        mu = np.concatenate(means)  # [G, D]
        w = np.concatenate(weights)
        w = np.maximum(w, 1e-8)
        G = len(mu)
        B = int(min(num_baseclasses, G))
        # normalize each dimension so no single feature dominates distances
        scale = 1.0 / (mu.std(axis=0) + 1e-8)
        z = mu * scale
        rng = np.random.default_rng(seed)
        # k-means++ style init, deterministic given seed
        centers = [z[rng.integers(G)]]
        for _ in range(B - 1):
            d2 = np.min(
                [np.sum((z - c) ** 2, axis=1) for c in centers], axis=0)
            prob = d2 * w
            tot = prob.sum()
            if tot <= 0:
                centers.append(z[rng.integers(G)])
                continue
            centers.append(z[rng.choice(G, p=prob / tot)])
        cent = np.stack(centers)
        assign = np.zeros(G, np.int64)
        for _ in range(kmeans_iters):
            d2 = ((z[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            new = d2.argmin(axis=1)
            if (new == assign).all():
                assign = new
                break
            assign = new
            for b in range(B):
                sel = assign == b
                if sel.any():
                    cent[b] = np.average(z[sel], axis=0, weights=w[sel])
        # compact away empty clusters
        used = np.unique(assign)
        remap = {int(b): i for i, b in enumerate(used)}
        assign = np.asarray([remap[int(b)] for b in assign])
        B = len(used)
        cent = cent[used]
        occ = np.asarray([w[assign == b].sum() for b in range(B)])

        # agglomerative merge by weighted centroid distance → binary tree
        parents = np.full(2 * B - 1, -1, np.int32)
        live: Dict[int, Tuple[np.ndarray, float]] = {
            b: (cent[b], occ[b]) for b in range(B)
        }
        nxt = B
        while len(live) > 1:
            keys = sorted(live)
            best = None
            for i, a in enumerate(keys):
                ca, wa = live[a]
                for b in keys[i + 1:]:
                    cb, wb = live[b]
                    # Ward-style merge cost: occupancy-weighted centroid gap
                    cost = (wa * wb) / (wa + wb) * np.sum((ca - cb) ** 2)
                    if best is None or cost < best[0]:
                        best = (cost, a, b)
            _, a, b = best
            ca, wa = live.pop(a)
            cb, wb = live.pop(b)
            parents[a] = parents[b] = nxt
            live[nxt] = ((wa * ca + wb * cb) / (wa + wb), wa + wb)
            nxt += 1
        root = nxt - 1 if B > 1 else 0
        parents = parents[:root + 1]
        parents[root] = root
        g2b, off = [], 0
        for gmm in am.pdfs:
            g2b.append(assign[off:off + gmm.num_mix].astype(np.int32))
            off += gmm.num_mix
        log.info("regtree: %d baseclasses over %d Gaussians, %d nodes",
                 B, G, len(parents))
        return RegressionTree(parents, g2b, B)

    # -- serialization (Kaldi-token style) --------------------------------------
    def write(self, f) -> None:
        init_kaldi_output_stream(f, True)
        write_token(f, "<RegressionTree>")
        write_int32(f, self.num_baseclasses)
        write_int_vector(f, self.parents)
        write_int32(f, len(self.gauss2bclass))
        for g in self.gauss2bclass:
            write_int_vector(f, g)
        write_token(f, "</RegressionTree>")

    @staticmethod
    def read(f) -> "RegressionTree":
        init_kaldi_input_stream(f)
        expect_token(f, "<RegressionTree>")
        nb = read_int32(f)
        parents = read_int_vector(f)
        np_ = read_int32(f)
        g2b = [read_int_vector(f) for _ in range(np_)]
        expect_token(f, "</RegressionTree>")
        return RegressionTree(parents, g2b, nb)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            self.write(f)

    @staticmethod
    def load(path: str) -> "RegressionTree":
        with open(path, "rb") as f:
            return RegressionTree.read(f)


class RegtreeTransform:
    """Estimated per-node transforms: `xforms[N, D, D+1]` plus the
    baseclass→transform map (RegtreeFmllrDiagGmm / RegtreeMllrDiagGmm roles).
    kind is 'fmllr' (feature-side, carries logdets) or 'mllr' (mean-side)."""

    def __init__(self, kind: str, xforms: np.ndarray,
                 bclass2xform: np.ndarray,
                 logdets: Optional[np.ndarray] = None):
        if kind not in ("fmllr", "mllr"):
            raise ValueError(f"bad regtree transform kind {kind!r}")
        self.kind = kind
        self.xforms = np.asarray(xforms, np.float64)
        self.bclass2xform = np.asarray(bclass2xform, np.int32)
        if logdets is None and kind == "fmllr":
            logdets = np.asarray(
                [np.linalg.slogdet(w[:, :-1])[1] for w in self.xforms])
        self.logdets = (np.asarray(logdets, np.float64)
                        if logdets is not None else None)

    @property
    def num_xforms(self) -> int:
        return len(self.xforms)

    def write(self, f) -> None:
        init_kaldi_output_stream(f, True)
        write_token(f, "<RegtreeXform>")
        write_token(f, "<Fmllr>" if self.kind == "fmllr" else "<Mllr>")
        write_int32(f, self.num_xforms)
        write_int_vector(f, self.bclass2xform)
        for w in self.xforms:
            write_matrix(f, w.astype(np.float32))
        write_token(f, "</RegtreeXform>")

    @staticmethod
    def read(f) -> "RegtreeTransform":
        init_kaldi_input_stream(f)
        expect_token(f, "<RegtreeXform>")
        kind = "fmllr" if read_token(f) == "<Fmllr>" else "mllr"
        n = read_int32(f)
        b2x = read_int_vector(f)
        xforms = np.stack([read_matrix(f) for _ in range(n)])
        expect_token(f, "</RegtreeXform>")
        return RegtreeTransform(kind, xforms, b2x)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            self.write(f)

    @staticmethod
    def load(path: str) -> "RegtreeTransform":
        with open(path, "rb") as f:
            return RegtreeTransform.read(f)


# ---------------------------------------------------------------------------
# accumulators
# ---------------------------------------------------------------------------


class RegtreeFmllrAccs:
    """Per-baseclass fMLLR sufficient statistics
    (RegtreeFmllrDiagGmmAccs)."""

    def __init__(self, dim: int, num_baseclasses: int):
        self.accs = [FmllrAccs(dim) for _ in range(num_baseclasses)]
        self.dim = dim

    def accumulate(self, am: AmDiagGmm, tree: RegressionTree,
                   feats: np.ndarray, pdf_ids: np.ndarray,
                   weights=None) -> None:
        x = np.asarray(feats, np.float64)
        pdf_ids = np.asarray(pdf_ids)
        w = (np.ones(len(x)) if weights is None
             else np.asarray(weights, np.float64))
        xp = np.concatenate([x, np.ones((len(x), 1))], axis=1)
        for pdf in np.unique(pdf_ids):
            sel = pdf_ids == pdf
            xs, xps, ws = x[sel], xp[sel], w[sel]
            gmm = am.pdfs[pdf]
            post = gmm.posteriors(xs) * ws[:, None]
            g2b = tree.gauss2bclass[pdf]
            for m in range(gmm.num_mix):
                gamma = post[:, m]
                tot = gamma.sum()
                if tot < 1e-8:
                    continue
                acc = self.accs[g2b[m]]
                inv_var = 1.0 / gmm.vars[m]
                gx = (xps * gamma[:, None]).sum(axis=0)
                acc.K += np.outer(inv_var * gmm.means[m], gx)
                scatter = (xps * gamma[:, None]).T @ xps
                acc.G += inv_var[:, None, None] * scatter[None, :, :]
                acc.beta += tot


class RegtreeMllrAccs:
    """Per-baseclass MLLR (mean-transform) statistics
    (RegtreeMllrDiagGmmAccs).  For each Gaussian m with posterior gamma_t:
    K_c[i] += (1/sigma2_i) (sum_t gamma_t x_ti) mu+;
    G_c[i] += (sum_t gamma_t) (1/sigma2_i) mu+ mu+^T."""

    def __init__(self, dim: int, num_baseclasses: int):
        self.K = np.zeros((num_baseclasses, dim, dim + 1))
        self.G = np.zeros((num_baseclasses, dim, dim + 1, dim + 1))
        self.beta = np.zeros(num_baseclasses)
        self.dim = dim

    def accumulate(self, am: AmDiagGmm, tree: RegressionTree,
                   feats: np.ndarray, pdf_ids: np.ndarray,
                   weights=None) -> None:
        x = np.asarray(feats, np.float64)
        pdf_ids = np.asarray(pdf_ids)
        w = (np.ones(len(x)) if weights is None
             else np.asarray(weights, np.float64))
        for pdf in np.unique(pdf_ids):
            sel = pdf_ids == pdf
            xs, ws = x[sel], w[sel]
            gmm = am.pdfs[pdf]
            post = gmm.posteriors(xs) * ws[:, None]
            g2b = tree.gauss2bclass[pdf]
            for m in range(gmm.num_mix):
                gamma = post[:, m]
                tot = gamma.sum()
                if tot < 1e-8:
                    continue
                c = g2b[m]
                inv_var = 1.0 / gmm.vars[m]
                mup = np.concatenate([gmm.means[m], [1.0]])
                sx = (xs * gamma[:, None]).sum(axis=0)  # [D]
                self.K[c] += (inv_var * sx)[:, None] * mup[None, :]
                self.G[c] += (tot * inv_var)[:, None, None] * np.outer(
                    mup, mup)[None, :, :]
                self.beta[c] += tot


# ---------------------------------------------------------------------------
# estimation: walk the tree, one transform per sufficiently-occupied node
# ---------------------------------------------------------------------------


def _regression_nodes(tree: RegressionTree, beta_leaf: np.ndarray,
                      min_count: float) -> Tuple[np.ndarray, np.ndarray]:
    """For each baseclass, the first ancestor (or self) whose subtree
    occupancy reaches min_count.  Returns (node-per-baseclass, per-node
    occupancy)."""
    n = tree.num_nodes
    beta = np.zeros(n)
    beta[:tree.num_baseclasses] = beta_leaf
    for i in range(n - 1):  # children precede parents by construction
        beta[tree.parents[i]] += beta[i]
    node_of = np.empty(tree.num_baseclasses, np.int64)
    for b in range(tree.num_baseclasses):
        node = b
        while beta[node] < min_count and node != tree.root:
            node = tree.parents[node]
        node_of[b] = node
    return node_of, beta


def _leaves_under(tree: RegressionTree, node: int) -> List[int]:
    under = []
    for b in range(tree.num_baseclasses):
        k = b
        while True:
            if k == node:
                under.append(b)
                break
            if k == tree.root:
                break
            k = tree.parents[k]
    return under


def estimate_regtree_fmllr(
    accs: RegtreeFmllrAccs, tree: RegressionTree,
    min_count: float = 1000.0, num_iters: int = 20,
) -> RegtreeTransform:
    """One fMLLR transform per regression node (gmm-est-regtree-fmllr /
    RegtreeFmllrDiagGmmAccs::Update)."""
    dim = accs.dim
    beta_leaf = np.asarray([a.beta for a in accs.accs])
    node_of, beta = _regression_nodes(tree, beta_leaf, min_count)
    identity = np.concatenate([np.eye(dim), np.zeros((dim, 1))], axis=1)
    cache: Dict[int, int] = {}
    xforms: List[np.ndarray] = []
    b2x = np.empty(tree.num_baseclasses, np.int32)
    for b in range(tree.num_baseclasses):
        node = int(node_of[b])
        if node not in cache:
            merged = FmllrAccs(dim)
            for leaf in _leaves_under(tree, node):
                merged.add(accs.accs[leaf])
            if merged.beta < max(min_count, 1.0):
                w = identity.copy()  # even the root is data-starved
            else:
                w = compute_fmllr_transform(
                    merged, num_iters=num_iters, min_count=0.0)
            cache[node] = len(xforms)
            xforms.append(w)
        b2x[b] = cache[node]
    log.info("regtree-fmllr: %d transforms for %d baseclasses "
             "(occupancy %.0f)", len(xforms), tree.num_baseclasses,
             beta[tree.root])
    return RegtreeTransform("fmllr", np.stack(xforms), b2x)


def estimate_regtree_mllr(
    accs: RegtreeMllrAccs, tree: RegressionTree, min_count: float = 1000.0,
) -> RegtreeTransform:
    """One MLLR mean-transform per regression node: closed-form per-row
    solve w_i = G_i^{-1} k_i (gmm-est-regtree-mllr /
    RegtreeMllrDiagGmmAccs::Update)."""
    dim = accs.dim
    node_of, beta = _regression_nodes(tree, accs.beta, min_count)
    identity = np.concatenate([np.eye(dim), np.zeros((dim, 1))], axis=1)
    cache: Dict[int, int] = {}
    xforms: List[np.ndarray] = []
    b2x = np.empty(tree.num_baseclasses, np.int32)
    tot_impr = tot_beta = 0.0
    for b in range(tree.num_baseclasses):
        node = int(node_of[b])
        if node not in cache:
            leaves = _leaves_under(tree, node)
            K = accs.K[leaves].sum(axis=0)
            Gm = accs.G[leaves].sum(axis=0)
            nb = accs.beta[leaves].sum()
            if nb < max(min_count, 1.0):
                w = identity.copy()
            else:
                w = np.stack([
                    np.linalg.solve(
                        Gm[i] + 1e-6 * np.eye(dim + 1), K[i])
                    for i in range(dim)
                ])
                q_new = sum(w[i] @ K[i] - 0.5 * w[i] @ Gm[i] @ w[i]
                            for i in range(dim))
                q_old = sum(identity[i] @ K[i]
                            - 0.5 * identity[i] @ Gm[i] @ identity[i]
                            for i in range(dim))
                tot_impr += q_new - q_old
                tot_beta += nb
            cache[node] = len(xforms)
            xforms.append(w)
        b2x[b] = cache[node]
    if tot_beta > 0:
        log.info("regtree-mllr: %d transforms, objf impr %.4f/frame over "
                 "%.0f frames", len(xforms), tot_impr / tot_beta, tot_beta)
    return RegtreeTransform("mllr", np.stack(xforms), b2x)


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------


def apply_mllr_to_model(am: AmDiagGmm, tree: RegressionTree,
                        xf: RegtreeTransform) -> AmDiagGmm:
    """Adapted copy of the model: mu' = A_c mu + b_c per Gaussian
    (RegtreeMllrDiagGmm::GetTransformedMeans)."""
    if xf.kind != "mllr":
        raise ValueError("apply_mllr_to_model needs an mllr transform")
    pdfs = []
    for p, gmm in enumerate(am.pdfs):
        means = gmm.means.copy()
        for m in range(gmm.num_mix):
            w = xf.xforms[xf.bclass2xform[tree.gauss2bclass[p][m]]]
            means[m] = w[:, :-1] @ gmm.means[m] + w[:, -1]
        pdfs.append(DiagGmm(gmm.weights.copy(), means, gmm.vars.copy()))
    return AmDiagGmm(pdfs)


def regtree_fmllr_loglikes(am: AmDiagGmm, tree: RegressionTree,
                           xf: RegtreeTransform,
                           feats: np.ndarray) -> np.ndarray:
    """[T, D] → [T, num_pdfs] loglikes where each Gaussian sees its own
    class's transformed features plus log|A| (DecodableAmDiagGmmRegtreeFmllr).
    """
    if xf.kind != "fmllr":
        raise ValueError("regtree_fmllr_loglikes needs an fmllr transform")
    x = np.asarray(feats, np.float64)
    T = len(x)
    ys = [x @ w[:, :-1].T + w[:, -1] for w in xf.xforms]  # per transform
    out = np.empty((T, am.num_pdfs))
    for p, gmm in enumerate(am.pdfs):
        xf_of_mix = xf.bclass2xform[tree.gauss2bclass[p]]  # [M]
        comp = np.empty((T, gmm.num_mix))
        for n in np.unique(xf_of_mix):
            sel = xf_of_mix == n
            y = ys[n]
            # per-component log N(y; mu, sigma) + log weight + log|A|
            iv = 1.0 / gmm.vars[sel]  # [m, D]
            gconst = (np.log(gmm.weights[sel])
                      - 0.5 * (gmm.dim * np.log(2 * np.pi)
                               + np.log(gmm.vars[sel]).sum(axis=1)
                               + (gmm.means[sel] ** 2 * iv).sum(axis=1)))
            comp[:, sel] = (gconst + xf.logdets[n]
                            + y @ (gmm.means[sel] * iv).T
                            - 0.5 * (y ** 2) @ iv.T)
        cmax = comp.max(axis=1, keepdims=True)
        out[:, p] = cmax[:, 0] + np.log(
            np.exp(comp - cmax).sum(axis=1))
    return out


# ---------------------------------------------------------------------------
# table holder ('regx') for per-speaker transform tables
# ---------------------------------------------------------------------------


def _register_holder() -> None:
    from old_kaldi_git_tpu.utils.table import Holder, register_holder

    class RegtreeXformHolder(Holder):
        name = "regx"

        def write(self, f, value, binary):
            value.write(f)

        def read(self, f):
            return RegtreeTransform.read(f)

    register_holder("regx", RegtreeXformHolder)


_register_holder()
