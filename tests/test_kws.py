"""Keyword search: exact occurrence posteriors (single-word + phrase DP),
inverted index round-trip/merge, ATWV scoring, and the CLI chain
(reference src/kws/ + kwsbin; SURVEY.md §2.7 kws row)."""

import math
import os
import subprocess
import sys

import numpy as np
import pytest

from old_kaldi_git_tpu.kws.atwv import compute_atwv
from old_kaldi_git_tpu.kws.search import (
    build_kws_index,
    load_index,
    merge_indexes,
    save_index,
    search_index,
    search_phrase,
)
from old_kaldi_git_tpu.lat.lattice import Lattice, LatticeArc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _two_path_lattice(p_top=0.7):
    """start --A--> s1 --B--> final   (combined cost -log p_top)
       start --C--> s1' --B--> final  (combined cost -log (1-p_top))
    acoustic costs carry everything (ac_scale=1, lm_scale=1 below)."""
    lat = Lattice()
    s0 = lat.add_state(0)
    s1 = lat.add_state(1)
    s2 = lat.add_state(1)
    s3 = lat.add_state(2)
    lat.start = s0
    lat.arcs[s0].append(LatticeArc(1, 10, 0.0, -math.log(p_top), s1))
    lat.arcs[s0].append(LatticeArc(1, 30, 0.0, -math.log(1 - p_top), s2))
    lat.arcs[s1].append(LatticeArc(1, 20, 0.0, 0.0, s3))
    lat.arcs[s2].append(LatticeArc(1, 20, 0.0, 0.0, s3))
    lat.finals[s3] = (0.0, 0.0)
    return lat


def test_single_word_posteriors():
    lat = _two_path_lattice(0.7)
    idx = build_kws_index({"u1": lat}, lm_scale=1.0, ac_scale=1.0)
    hits10 = search_index(idx, 10)
    hits20 = search_index(idx, 20)
    hits30 = search_index(idx, 30)
    assert len(hits10) == len(hits30) == 1 and len(hits20) == 1
    np.testing.assert_allclose(math.exp(hits10[0].log_post), 0.7, rtol=1e-6)
    np.testing.assert_allclose(math.exp(hits30[0].log_post), 0.3, rtol=1e-6)
    # word 20 on both paths: posterior 1.0, start frame 1 shared
    np.testing.assert_allclose(math.exp(hits20[0].log_post), 1.0, rtol=1e-6)
    assert hits10[0].tbeg == 0 and hits10[0].tend == 1
    assert hits20[0].tbeg == 1 and hits20[0].tend == 2


def test_phrase_search_exact_posterior():
    lat = _two_path_lattice(0.7)
    # phrase [10, 20] realized only on the top path
    hits = search_phrase(lat, [10, 20], lm_scale=1.0, ac_scale=1.0)
    assert len(hits) == 1
    tbeg, tend, lp = hits[0]
    assert (tbeg, tend) == (0, 2)
    np.testing.assert_allclose(math.exp(lp), 0.7, rtol=1e-6)
    # phrase [30, 20] on the other path
    (tb, te, lp2), = search_phrase(lat, [30, 20], lm_scale=1.0, ac_scale=1.0)
    np.testing.assert_allclose(math.exp(lp2), 0.3, rtol=1e-6)
    # absent phrase
    assert search_phrase(lat, [20, 10], lm_scale=1.0, ac_scale=1.0) == []
    # single-word phrase agrees with the index
    (tb1, te1, lp1), = search_phrase(lat, [10], lm_scale=1.0, ac_scale=1.0)
    np.testing.assert_allclose(math.exp(lp1), 0.7, rtol=1e-6)


def test_phrase_through_epsilon():
    """Words separated by an epsilon arc still match as a phrase."""
    lat = Lattice()
    s0, s1, s2, s3 = (lat.add_state(t) for t in (0, 1, 2, 3))
    lat.start = s0
    lat.arcs[s0].append(LatticeArc(1, 10, 0.0, 0.0, s1))
    lat.arcs[s1].append(LatticeArc(1, 0, 0.0, 0.0, s2))  # epsilon
    lat.arcs[s2].append(LatticeArc(1, 20, 0.0, 0.0, s3))
    lat.finals[s3] = (0.0, 0.0)
    (tb, te, lp), = search_phrase(lat, [10, 20], lm_scale=1.0, ac_scale=1.0)
    assert (tb, te) == (0, 3)
    np.testing.assert_allclose(math.exp(lp), 1.0, rtol=1e-6)


def test_index_roundtrip_and_union(tmp_path):
    lat = _two_path_lattice(0.6)
    i1 = build_kws_index({"u1": lat}, lm_scale=1.0, ac_scale=1.0)
    i2 = build_kws_index({"u2": lat}, lm_scale=1.0, ac_scale=1.0)
    p1 = str(tmp_path / "i1.idx")
    save_index(i1, p1)
    r1 = load_index(p1)
    assert {w: len(h) for w, h in r1.items()} == {
        w: len(h) for w, h in i1.items()}
    merged = merge_indexes([i1, i2])
    assert {h.utt for h in merged[10]} == {"u1", "u2"}


def test_atwv():
    refs = [("kw1", "u1", 0.0, 0.5), ("kw1", "u2", 1.0, 1.5),
            ("kw2", "u1", 2.0, 2.5)]
    # perfect
    hyps = [(k, u, b, e, 1.0) for k, u, b, e in refs]
    atwv, per = compute_atwv(3600.0, refs, hyps)
    assert atwv == pytest.approx(1.0)
    # all missed
    atwv0, _ = compute_atwv(3600.0, refs, [])
    assert atwv0 == pytest.approx(0.0)
    # one false alarm on kw2 costs beta/(T - n_true)
    hyps_fa = hyps + [("kw2", "u2", 9.0, 9.5, 0.9)]
    atwv_fa, per_fa = compute_atwv(3600.0, refs, hyps_fa)
    expected_kw2 = 1.0 - 999.9 / (3600.0 - 1)
    assert per_fa["kw2"] == pytest.approx(expected_kw2)
    # mean over the 2 keywords (kw1 has two refs but is one term)
    assert atwv_fa == pytest.approx((1.0 + expected_kw2) / 2)
    # a hit matching within 0.5 s still counts
    hyps_near = [("kw1", "u1", 0.3, 0.8, 1.0)]
    _, per_near = compute_atwv(3600.0, refs[:1], hyps_near)
    assert per_near["kw1"] == pytest.approx(1.0)


def run(args, cwd):
    r = subprocess.run(
        [sys.executable, "-m", "old_kaldi_git_tpu.bin"] + args,
        check=False, capture_output=True, text=True, cwd=str(cwd),
        env={**os.environ, "PYTHONPATH": REPO},
    )
    if r.returncode != 0:
        raise AssertionError(
            f"{args[0]} failed rc={r.returncode}\n{r.stdout}\n{r.stderr}")
    return r


def test_kws_cli_chain(tmp_path):
    from old_kaldi_git_tpu.utils.table import TableWriter

    lat = _two_path_lattice(0.7)
    with TableWriter(f"ark:{tmp_path}/lat.ark", "lat") as w:
        w["utt1"] = lat
    (tmp_path / "keywords.txt").write_text(
        "KW-A 10\nKW-PHRASE 10 20\nKW-NONE 99\n")
    run(["lattice-to-kws-index", "--acoustic-scale=1.0", "ark:lat.ark",
         "kws.idx"], tmp_path)
    run(["kws-index-union", "kws.idx", "kws.idx", "merged.idx"], tmp_path)
    run(["kws-search", "--acoustic-scale=1.0", "--index=kws.idx",
         "ark:lat.ark", "keywords.txt", "results.txt"], tmp_path)
    lines = (tmp_path / "results.txt").read_text().splitlines()
    by_kw = {}
    for ln in lines:
        p = ln.split()
        by_kw.setdefault(p[0], []).append(p)
    assert "KW-NONE" not in by_kw
    assert float(by_kw["KW-A"][0][4]) == pytest.approx(0.7, rel=1e-4)
    assert float(by_kw["KW-PHRASE"][0][4]) == pytest.approx(0.7, rel=1e-4)
    # score against a reference occurrence file (frame times here)
    (tmp_path / "ref.txt").write_text("KW-A utt1 0 1\nKW-PHRASE utt1 0 2\n")
    out = run(["compute-atwv", "3600", "ref.txt", "results.txt"], tmp_path)
    assert "ATWV = 1.0000" in out.stdout
