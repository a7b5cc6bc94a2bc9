"""Multiclass logistic regression (language-id / speaker-id backend).

Parity with reference src/ivector/logistic-regression.{h,cc}: a linear
classifier over i-vectors scored as log-posteriors, trained by batch
gradient ascent on the L2-regularized log-likelihood (the reference uses
OptimizeLbfgs; Adam on the full batch reaches the same optimum for this
convex objective), with the reference's `mix_up` trick — classes may own
several weight rows ("mixture components"), scored by logsumexp over the
class's rows (LogisticRegression::MixUp / class_to_classes_ mapping).

Inputs are augmented with a trailing 1 (bias), as the reference does in
Train (xs_with_prior).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from old_kaldi_git_tpu.utils import io_funcs as iof
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("logistic")


@dataclasses.dataclass
class LogisticRegressionConfig:
    max_steps: int = 200
    normalizer: float = 0.0025  # L2 regularization weight
    learning_rate: float = 0.2
    mix_up: int = 0  # target total number of weight rows (0 = one per class)
    power: float = 0.15  # occupancy^power row allocation, as the reference


class LogisticRegression:
    """weights [R, D+1]; row_to_class [R] maps weight rows to classes."""

    def __init__(self, weights: np.ndarray,
                 row_to_class: Optional[np.ndarray] = None):
        self.weights = np.asarray(weights, np.float64)
        if row_to_class is None:
            row_to_class = np.arange(self.weights.shape[0])
        self.row_to_class = np.asarray(row_to_class, np.int32)
        if self.weights.ndim != 2 or len(self.row_to_class) != len(self.weights):
            raise KaldiError("LogisticRegression: bad shapes")

    @property
    def num_classes(self) -> int:
        return int(self.row_to_class.max()) + 1

    @property
    def dim(self) -> int:
        return self.weights.shape[1] - 1

    def _row_logits(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64)
        if x.ndim == 1:
            x = x[None]
        xa = np.concatenate([x, np.ones((len(x), 1))], axis=1)
        return xa @ self.weights.T  # [N, R]

    def log_posteriors(self, x: np.ndarray) -> np.ndarray:
        """[N, D] (or [D]) → [N, K] log p(class | x); rows of the same
        class combine by logsumexp (reference GetLogPosteriors)."""
        logits = self._row_logits(x)
        K = self.num_classes
        out = np.full((logits.shape[0], K), -np.inf)
        for k in range(K):
            rows = np.flatnonzero(self.row_to_class == k)
            m = logits[:, rows].max(axis=1)
            out[:, k] = m + np.log(
                np.exp(logits[:, rows] - m[:, None]).sum(axis=1))
        out -= out.max(axis=1, keepdims=True)
        out -= np.log(np.exp(out).sum(axis=1, keepdims=True))
        return out

    def classify(self, x: np.ndarray) -> np.ndarray:
        return self.log_posteriors(x).argmax(axis=1)

    def scale_priors(self, log_prior_scales: np.ndarray) -> None:
        """Add per-class log-prior offsets to the bias column (reference
        ScalePriors, used to flatten training-set priors at test time)."""
        self.weights[:, -1] += np.asarray(log_prior_scales)[self.row_to_class]

    # -- serialization -------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            iof.init_kaldi_output_stream(f, True)
            iof.write_token(f, "<LogisticRegression>")
            iof.write_matrix(f, self.weights.astype(np.float64),
                             dtype=np.float64)
            iof.write_int_vector(f, self.row_to_class)
            iof.write_token(f, "</LogisticRegression>")

    @staticmethod
    def load(path: str) -> "LogisticRegression":
        with open(path, "rb") as f:
            if not iof.init_kaldi_input_stream(f):
                raise KaldiError("LogisticRegression.load: expected binary")
            iof.expect_token(f, "<LogisticRegression>")
            w = iof.read_matrix(f)
            r2c = iof.read_int_vector(f)
            iof.expect_token(f, "</LogisticRegression>")
            return LogisticRegression(w, r2c)


def _objf_and_grad(w: np.ndarray, row_to_class: np.ndarray, xa: np.ndarray,
                   ys: np.ndarray, normalizer: float):
    """Mean log p(y|x) − normalizer·||w||²; gradient wrt w [R, D+1]."""
    n = len(xa)
    logits = xa @ w.T  # [N, R]
    m = logits.max(axis=1, keepdims=True)
    e = np.exp(logits - m)
    denom = e.sum(axis=1, keepdims=True)
    post_rows = e / denom  # [N, R] p(row | x)
    # p(class y | x): sum of its rows
    K = int(row_to_class.max()) + 1
    onehot_rows = (row_to_class[None, :] == ys[:, None])  # [N, R]
    p_y = (post_rows * onehot_rows).sum(axis=1)  # [N]
    objf = float(np.log(np.maximum(p_y, 1e-300)).mean()) \
        - normalizer * float((w * w).sum())
    # d objf / d logits = (within-class row posterior) − p(row | x)
    within = post_rows * onehot_rows / np.maximum(p_y, 1e-300)[:, None]
    dlogits = (within - post_rows) / n
    grad = dlogits.T @ xa - 2.0 * normalizer * w
    return objf, grad


def train_logistic_regression(
    xs: np.ndarray,
    ys: Sequence[int],
    config: Optional[LogisticRegressionConfig] = None,
    seed: int = 0,
) -> LogisticRegression:
    """Batch training (reference LogisticRegression::Train + TrainParameters;
    with config.mix_up > num_classes, big classes get extra weight rows
    split from the trained row with small perturbations, then training
    continues — reference MixUp)."""
    cfg = config or LogisticRegressionConfig()
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.int64)
    K = int(ys.max()) + 1
    xa = np.concatenate([xs, np.ones((len(xs), 1))], axis=1)
    w = np.zeros((K, xs.shape[1] + 1))
    row_to_class = np.arange(K)
    w = _adam(w, row_to_class, xa, ys, cfg)
    if cfg.mix_up > K:
        w, row_to_class = _mix_up(w, row_to_class, ys, cfg, seed)
        w = _adam(w, row_to_class, xa, ys, cfg)
    return LogisticRegression(w, row_to_class)


def _adam(w, row_to_class, xa, ys, cfg: LogisticRegressionConfig):
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    b1, b2, eps = 0.9, 0.999, 1e-8
    last = -np.inf
    for t in range(1, cfg.max_steps + 1):
        objf, g = _objf_and_grad(w, row_to_class, xa, ys, cfg.normalizer)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        w = w + cfg.learning_rate * mh / (np.sqrt(vh) + eps)
        if t % 50 == 0 or t == cfg.max_steps:
            log.info("logistic step %d: objf %.5f", t, objf)
        last = objf
    log.info("logistic training done: objf %.5f", last)
    return w


def _mix_up(w, row_to_class, ys, cfg: LogisticRegressionConfig, seed: int):
    """Allocate extra rows ∝ count^power (reference GetSplitTargets use)."""
    rng = np.random.default_rng(seed)
    K = int(row_to_class.max()) + 1
    counts = np.bincount(ys, minlength=K).astype(np.float64)
    targets = np.maximum(counts**cfg.power, 1.0)
    targets = np.maximum(
        np.round(targets * cfg.mix_up / targets.sum()).astype(int), 1)
    rows: List[np.ndarray] = []
    r2c: List[int] = []
    for k in range(K):
        base = w[row_to_class == k]
        for j in range(targets[k]):
            src = base[j % len(base)]
            noise = 1e-4 * rng.standard_normal(src.shape) if j >= len(base) \
                else 0.0
            rows.append(src + noise)
            r2c.append(k)
    log.info("mix_up: %d classes -> %d rows", K, len(rows))
    return np.stack(rows), np.asarray(r2c, np.int32)
