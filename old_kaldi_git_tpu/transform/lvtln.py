"""Linear VTLN: vocal-tract-length normalization as a class of linear
feature transforms.

Reference parity: src/transform/lvtln.{h,cc} (LinearVtln) +
gmmbin/gmm-init-lvtln, gmm-train-lvtln-special, gmm-est-lvtln-trans.
One D x D linear map per warp factor; training fits each class by least
squares to map warp-w features to warp-1.0 features
(gmm-train-lvtln-special's "special" regression); at test time the class
(and an offset) maximizing the fMLLR auxiliary given per-speaker stats is
selected, yielding both a transform and a warp-factor estimate.

Small host-side linear algebra (numpy), like the other transform
estimators (SURVEY.md §7.3 item 3).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from old_kaldi_git_tpu.transform.basis_fmllr import _aux_objf
from old_kaldi_git_tpu.transform.fmllr import FmllrAccs
from old_kaldi_git_tpu.utils.io_funcs import (
    expect_token,
    init_kaldi_input_stream,
    init_kaldi_output_stream,
    read_int32,
    read_matrix,
    read_vector,
    write_int32,
    write_matrix,
    write_token,
    write_vector,
)
from old_kaldi_git_tpu.utils.log import get_logger

log = get_logger("lvtln")


class LinearVtln:
    """`mats[C, D, D]` linear transforms, one per warp factor."""

    def __init__(self, mats: np.ndarray, warps: Sequence[float]):
        self.mats = np.asarray(mats, np.float64)
        self.warps = [float(w) for w in warps]
        if self.mats.shape[0] != len(self.warps):
            raise ValueError("one transform per warp required")

    @staticmethod
    def init(dim: int, warps: Sequence[float]) -> "LinearVtln":
        """Identity transforms (gmm-init-lvtln)."""
        return LinearVtln(
            np.broadcast_to(np.eye(dim), (len(warps), dim, dim)).copy(),
            warps,
        )

    @property
    def num_classes(self) -> int:
        return len(self.warps)

    @property
    def dim(self) -> int:
        return self.mats.shape[1]

    def set_transform(self, c: int, a: np.ndarray) -> None:
        self.mats[c] = a

    # -- Kaldi-token serialization ------------------------------------------
    def write(self, f) -> None:
        init_kaldi_output_stream(f, True)
        write_token(f, "<LinearVtln>")
        write_int32(f, self.num_classes)
        write_vector(f, np.asarray(self.warps, np.float32))
        for c in range(self.num_classes):
            write_matrix(f, self.mats[c].astype(np.float32))
        write_token(f, "</LinearVtln>")

    @staticmethod
    def read(f) -> "LinearVtln":
        init_kaldi_input_stream(f)
        expect_token(f, "<LinearVtln>")
        n = read_int32(f)
        warps = read_vector(f)
        mats = np.stack([read_matrix(f) for _ in range(n)])
        expect_token(f, "</LinearVtln>")
        return LinearVtln(mats, warps.tolist())

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            self.write(f)

    @staticmethod
    def load(path: str) -> "LinearVtln":
        with open(path, "rb") as f:
            return LinearVtln.read(f)


def train_lvtln_class(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
) -> np.ndarray:
    """Least-squares linear map A minimizing sum ||y_t - A x_t||^2 over
    (x = warped feats, y = warp-1.0 feats) frame pairs
    (gmm-train-lvtln-special)."""
    dim = pairs[0][0].shape[1]
    xtx = np.zeros((dim, dim))
    ytx = np.zeros((dim, dim))
    for x, y in pairs:
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        t = min(len(x), len(y))
        xtx += x[:t].T @ x[:t]
        ytx += y[:t].T @ x[:t]
    return ytx @ np.linalg.inv(xtx + 1e-6 * np.eye(dim))


def select_lvtln_transform(
    accs: FmllrAccs,
    lvtln: LinearVtln,
    estimate_offset: bool = True,
    min_count: float = 10.0,
) -> Optional[Tuple[np.ndarray, float, int, float]]:
    """Pick the class maximizing the fMLLR auxiliary given the speaker's
    stats; optionally estimate the bias row for each candidate
    (gmm-est-lvtln-trans).  Returns (W [D, D+1], warp, class, objf/frame
    improvement over identity) or None below min_count."""
    if accs.beta < min_count:
        return None
    dim = lvtln.dim
    base = np.concatenate([np.eye(dim), np.zeros((dim, 1))], axis=1)
    start = _aux_objf(base, accs)
    best: Optional[Tuple[float, np.ndarray, int]] = None
    for c in range(lvtln.num_classes):
        w = np.concatenate([lvtln.mats[c], np.zeros((dim, 1))], axis=1)
        if estimate_offset:
            # closed-form per-row bias given fixed A: maximize
            # K_i b_i - 1/2 (w_i + b_i e_D)' G_i (w_i + b_i e_D) in b_i
            for i in range(dim):
                g = accs.G[i]
                denom = g[dim, dim]
                if denom <= 0:
                    continue
                num = accs.K[i, dim] - float(w[i, :dim] @ g[:dim, dim])
                w[i, dim] = num / denom
        obj = _aux_objf(w, accs)
        if best is None or obj > best[0]:
            best = (obj, w, c)
    obj, w, c = best
    impr = (obj - start) / accs.beta
    log.info(
        "lvtln: class %d (warp %.2f), objf impr %.4f/frame over %.0f frames",
        c, lvtln.warps[c], impr, accs.beta,
    )
    return w, lvtln.warps[c], c, impr
