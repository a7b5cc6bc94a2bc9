"""Exact MBR (sausage) decoding tests against brute-force oracles."""

import itertools
import math

import numpy as np
import pytest

from old_kaldi_git_tpu.lat.determinize import determinize_lattice
from old_kaldi_git_tpu.lat.mbr import minimum_bayes_risk
from tests.test_determinize import clat_paths, random_lattice


def edit_distance(a, b):
    Q, P = len(a), len(b)
    d = np.zeros((Q + 1, P + 1))
    d[:, 0] = np.arange(Q + 1)
    d[0, :] = np.arange(P + 1)
    for i in range(1, Q + 1):
        for j in range(1, P + 1):
            d[i, j] = min(
                d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                d[i - 1, j] + 1,
                d[i, j - 1] + 1,
            )
    return d[Q, P]


def path_posteriors(clat, lm_scale, ac_scale):
    """{word-seq: posterior}, brute-forced (per-word-seq best AND summed —
    the determinized lattice has one path per word seq)."""
    paths = clat_paths(clat)
    # clat_paths returns combined g+a cost of the (unique) path
    # recompute under the given scales by enumerating again
    out = {}

    def dfs(s, words, cost):
        from old_kaldi_git_tpu.lat.lattice import INF

        g, a, _ = clat.finals[s]
        if g != INF:
            key = tuple(words)
            c = cost + lm_scale * g + ac_scale * a
            out[key] = min(out.get(key, math.inf), c)
        for arc in clat.arcs[s]:
            dfs(arc.nextstate, words + [arc.word],
                cost + lm_scale * arc.graph_cost + ac_scale * arc.acoustic_cost)

    dfs(clat.start, [], 0.0)
    mn = min(out.values())
    probs = {k: math.exp(-(v - mn)) for k, v in out.items()}
    z = sum(probs.values())
    return {k: p / z for k, p in probs.items()}


def brute_expected_wer(clat, hyp, lm_scale, ac_scale):
    post = path_posteriors(clat, lm_scale, ac_scale)
    return sum(p * edit_distance(list(k), list(hyp)) for k, p in post.items())


def test_expected_edit_tracks_bruteforce():
    """The recursion's statistic upper-bounds the true expected edit
    distance (state-level averaging commits to shared alignment moves, so
    per-path alignments can be mildly suboptimal — same property as the
    reference's AccStats) and stays tight on small lattices."""
    rng = np.random.default_rng(0)
    checked = 0
    for _ in range(30):
        lat = random_lattice(rng, num_states=8, num_arcs=18, num_words=3)
        clat = determinize_lattice(lat)
        if clat.num_states == 0:
            continue
        res = minimum_bayes_risk(clat, 1.0, 1.0, max_iters=4)
        if res is None:
            continue
        want = brute_expected_wer(clat, res.words, 1.0, 1.0)
        assert res.expected_wer >= want - 1e-6
        assert res.expected_wer <= want + 0.05 * max(want, 1.0)
        checked += 1
    assert checked >= 20


def test_expected_edit_exact_on_linear_lattice():
    """Single-path lattice: the statistic IS the plain edit distance."""
    from old_kaldi_git_tpu.lat.determinize import (
        CompactLattice, CompactLatticeArc,
    )

    clat = CompactLattice()
    words = [3, 1, 2]
    s = clat.add_state()
    clat.start = s
    for w in words:
        ns = clat.add_state()
        clat.arcs[s].append(CompactLatticeArc(w, 0.5, 0.5, (1,), ns))
        s = ns
    clat.finals[s] = (0.0, 0.0, ())
    res = minimum_bayes_risk(clat, 1.0, 1.0)
    assert res.words == words
    assert res.expected_wer == pytest.approx(0.0, abs=1e-9)
    assert all(c == pytest.approx(1.0) for c in res.confidences)


def test_mbr_beats_or_ties_map():
    """The MBR hypothesis never has higher expected WER than the MAP path
    (and must beat the best alternative found by local search at least as
    often as not)."""
    rng = np.random.default_rng(1)
    improved = 0
    total = 0
    for _ in range(40):
        lat = random_lattice(rng, num_states=9, num_arcs=22, num_words=3)
        clat = determinize_lattice(lat)
        if clat.num_states == 0:
            continue
        res = minimum_bayes_risk(clat, 1.0, 1.0)
        if res is None:
            continue
        map_words, _, _ = clat.best_path(1.0, 1.0)
        e_map = brute_expected_wer(clat, map_words, 1.0, 1.0)
        e_mbr = brute_expected_wer(clat, res.words, 1.0, 1.0)
        assert e_mbr <= e_map + 1e-6, (map_words, res.words, e_map, e_mbr)
        improved += e_mbr < e_map - 1e-9
        total += 1
    assert total >= 25
    assert improved >= 1  # on random lattices MBR finds genuinely better hyps


def test_sausage_and_confidences_wellformed():
    rng = np.random.default_rng(2)
    for _ in range(10):
        lat = random_lattice(rng, num_states=10, num_arcs=25)
        clat = determinize_lattice(lat)
        res = minimum_bayes_risk(clat, 1.0, 1.0)
        if res is None:
            continue
        assert len(res.confidences) == len(res.words)
        for c in res.confidences:
            assert 0.0 <= c <= 1.0 + 1e-9
        for bin_ in res.sausage:
            tot = sum(p for _, p in bin_)
            assert tot <= 1.0 + 1e-6
            assert all(p >= -1e-12 for _, p in bin_)


def test_mbr_word_durations():
    """Word (begin, end) times: multi-frame words get end > begin."""
    from old_kaldi_git_tpu.lat.determinize import (
        CompactLattice, CompactLatticeArc,
    )

    clat = CompactLattice()
    s = clat.add_state()
    clat.start = s
    durations = [3, 5, 2]
    for i, d in enumerate(durations):
        ns = clat.add_state()
        clat.arcs[s].append(
            CompactLatticeArc(i + 1, 0.2, 0.2, tuple(range(1, d + 1)), ns)
        )
        s = ns
    clat.finals[s] = (0.0, 0.0, ())
    res = minimum_bayes_risk(clat, 1.0, 1.0)
    assert res.words == [1, 2, 3]
    starts = [t[0] for t in res.times]
    ends = [t[1] for t in res.times]
    # begins are cumulative durations; ends exceed begins by each duration
    assert starts == pytest.approx([0.0, 3.0, 8.0], abs=1e-6)
    assert ends == pytest.approx([3.0, 8.0, 10.0], abs=1e-6)
