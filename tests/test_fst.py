"""M2 tests: WFST core algorithms on random FSTs (rand-fst oracle pattern,
SURVEY.md §4: generate random FSTs, apply op, verify bounded-length weighted
equivalence)."""

import math
import random

import pytest

from old_kaldi_git_tpu.fst import (
    Arc,
    SymbolTable,
    VectorFst,
    compose,
    determinize_star,
    fst_equivalent,
    minimize_encoded,
    project,
    push_special,
    remove_eps_local,
    rm_symbols,
    shortest_path,
)
from old_kaldi_git_tpu.fst.vector_fst import INF, linear_fst
from old_kaldi_git_tpu.fst.algorithms import _string_weights
from old_kaldi_git_tpu.fst.rand import rand_fst


def test_linear_and_shortest_path():
    fst = linear_fst([1, 2, 3])
    w, ils, ols = shortest_path(fst)
    assert w == 0.0 and ils == [1, 2, 3] and ols == [1, 2, 3]


def test_connect_removes_dead_states():
    fst = VectorFst()
    s0, s1, s2 = fst.add_state(), fst.add_state(), fst.add_state()
    fst.set_start(s0)
    fst.add_arc(s0, Arc(1, 1, 0.5, s1))
    fst.add_arc(s0, Arc(2, 2, 0.5, s2))  # s2 is a dead end
    fst.set_final(s1)
    fst.connect()
    assert fst.num_states == 2
    assert fst.num_arcs == 1


def test_topsort():
    fst = VectorFst()
    states = [fst.add_state() for _ in range(4)]
    fst.set_start(states[0])
    fst.add_arc(states[0], Arc(1, 1, 0, states[2]))
    fst.add_arc(states[2], Arc(2, 2, 0, states[1]))
    fst.add_arc(states[1], Arc(3, 3, 0, states[3]))
    fst.set_final(states[3])
    assert fst.topsort()
    for s in fst.states():
        for a in fst.arcs[s]:
            assert a.nextstate > s
    # cyclic case
    fst.add_arc(2, Arc(9, 9, 0, 0))
    assert not fst.topsort()


def test_compose_linear():
    # a:b then b:c gives a:c
    t1 = linear_fst([1], [2])
    t2 = linear_fst([2], [3])
    c = compose(t1, t2)
    w, ils, ols = shortest_path(c)
    assert ils == [1] and ols == [3]


def test_compose_with_epsilons_weighted():
    # fst1: 1:eps / 0.5 then 2:4 /0.25 ; fst2: 4:7 /1.0
    f1 = VectorFst()
    a, b, c = f1.add_state(), f1.add_state(), f1.add_state()
    f1.set_start(a)
    f1.add_arc(a, Arc(1, 0, 0.5, b))
    f1.add_arc(b, Arc(2, 4, 0.25, c))
    f1.set_final(c, 0.125)
    f2 = VectorFst()
    x, y = f2.add_state(), f2.add_state()
    f2.set_start(x)
    f2.add_arc(x, Arc(4, 7, 1.0, y))
    f2.set_final(y, 2.0)
    c12 = compose(f1, f2)
    w, ils, ols = shortest_path(c12)
    assert ils == [1, 2] and ols == [7]
    assert w == pytest.approx(0.5 + 0.25 + 0.125 + 1.0 + 2.0)


def test_compose_equivalence_random():
    """compose(A, Id) == A when Id is an identity over the olabel alphabet."""
    rng = random.Random(11)
    for trial in range(10):
        a = rand_fst(rng, functional_ish=False)
        ident = VectorFst()
        s = ident.add_state()
        ident.set_start(s)
        ident.set_final(s, 0.0)
        for lab in range(1, 4):
            ident.add_arc(s, Arc(lab, lab, 0.0, s))
        c = compose(a, ident)
        assert fst_equivalent(a, c, max_len=5), f"trial {trial}"


def test_determinize_star_simple():
    # nondeterministic: two paths for input '1' with different weights
    fst = VectorFst()
    s0, s1, s2, s3 = [fst.add_state() for _ in range(4)]
    fst.set_start(s0)
    fst.add_arc(s0, Arc(1, 5, 1.0, s1))
    fst.add_arc(s0, Arc(1, 5, 2.0, s2))
    fst.add_arc(s1, Arc(2, 6, 0.5, s3))
    fst.add_arc(s2, Arc(2, 6, 0.5, s3))
    fst.set_final(s3)
    det = determinize_star(fst)
    # deterministic: no state has two arcs with the same ilabel, no input-eps
    for s in det.states():
        ils = [a.ilabel for a in det.arcs[s]]
        assert 0 not in ils
        assert len(ils) == len(set(ils))
    assert fst_equivalent(fst, det, max_len=5)


def test_determinize_star_removes_epsilons_random():
    rng = random.Random(7)
    count = 0
    for trial in range(12):
        fst = rand_fst(rng, num_states=5, num_arcs=8, functional_ish=True,
                       acyclic=True, eps_prob=0.3)
        if fst.start == -1 or fst.num_states == 0:
            continue
        det = determinize_star(fst)
        count += 1
        for s in det.states():
            ils = [a.ilabel for a in det.arcs[s]]
            assert 0 not in ils, "input-eps left after determinize_star"
            assert len(ils) == len(set(ils)), "not deterministic"
        assert fst_equivalent(fst, det, max_len=6), f"trial {trial}"
    assert count >= 5  # enough non-trivial cases exercised


def test_determinize_star_log_semiring():
    # two paths same string: tropical keeps min (1.0), log sums
    fst = VectorFst()
    s0, s1 = fst.add_state(), fst.add_state()
    fst.set_start(s0)
    fst.add_arc(s0, Arc(1, 1, 1.0, s1))
    fst.add_arc(s0, Arc(1, 1, 2.0, s1))
    fst.set_final(s1)
    det_trop = determinize_star(fst, use_log=False)
    det_log = determinize_star(fst, use_log=True)
    wt = _string_weights(det_trop, 3, use_log=False)[((1,), (1,))]
    wl = _string_weights(det_log, 3, use_log=False)[((1,), (1,))]
    assert wt == pytest.approx(1.0)
    assert wl == pytest.approx(-math.log(math.exp(-1) + math.exp(-2)))


def test_minimize_encoded():
    rng = random.Random(3)
    for trial in range(8):
        fst = rand_fst(rng, num_states=6, num_arcs=9, functional_ish=True,
                       acyclic=True, eps_prob=0.0)
        if fst.start == -1 or fst.num_states == 0:
            continue
        det = determinize_star(fst)
        mini = minimize_encoded(det)
        assert mini.num_states <= det.num_states
        assert fst_equivalent(det, mini, max_len=6), f"trial {trial}"


def test_minimize_merges_identical_suffixes():
    # two branches with identical suffix structure must merge
    fst = VectorFst()
    s = [fst.add_state() for _ in range(5)]
    fst.set_start(s[0])
    fst.add_arc(s[0], Arc(1, 1, 0.0, s[1]))
    fst.add_arc(s[0], Arc(2, 2, 0.0, s[2]))
    fst.add_arc(s[1], Arc(3, 3, 0.0, s[3]))
    fst.add_arc(s[2], Arc(3, 3, 0.0, s[4]))
    fst.set_final(s[3])
    fst.set_final(s[4])
    mini = minimize_encoded(fst)
    assert mini.num_states == 3


def test_remove_eps_local():
    rng = random.Random(5)
    for trial in range(8):
        fst = rand_fst(rng, num_states=6, num_arcs=10, eps_prob=0.4, acyclic=True)
        if fst.start == -1 or fst.num_states == 0:
            continue
        before = fst.copy()
        remove_eps_local(fst)
        assert fst_equivalent(before, fst, max_len=6), f"trial {trial}"


def test_rm_symbols_and_project():
    fst = linear_fst([1, 2, 3], [4, 5, 6])
    rm_symbols(fst, [2], side="input")
    w, ils, ols = shortest_path(fst)
    assert ils == [1, 3] and ols == [4, 5, 6]
    p = project(fst, "output")
    w, ils, ols = shortest_path(p)
    assert ils == [4, 5, 6]


def test_push_special_uniform_outflow():
    rng = random.Random(9)
    fst = rand_fst(rng, num_states=5, num_arcs=12, eps_prob=0.0)
    before = fst.copy()
    push_special(fst)
    # outflow per state is uniform
    flows = []
    for s in fst.states():
        acc = sum(math.exp(-a.weight) for a in fst.arcs[s])
        if fst.finals[s] != INF:
            acc += math.exp(-fst.finals[s])
        flows.append(acc)
    assert max(flows) - min(flows) < 0.05
    # per-string weights changed by a global constant only
    wa = _string_weights(before, 5, use_log=False)
    wb = _string_weights(fst, 5, use_log=False)
    diffs = [wb[k] - wa[k] for k in wa if k in wb]
    assert max(diffs) - min(diffs) < 1e-3


def test_symbol_table(tmp_path):
    t = SymbolTable.from_symbols(["yes", "no"])
    assert t["<eps>"] == 0 and t["yes"] == 1 and t["no"] == 2
    assert t[2] == "no"
    p = tmp_path / "words.txt"
    t.write(str(p))
    t2 = SymbolTable.read(str(p))
    assert t2["no"] == 2 and len(t2) == 3


def test_fst_text_and_binary_io(tmp_path):
    rng = random.Random(13)
    fst = rand_fst(rng)
    text = fst.to_text()
    back = VectorFst.from_text(text)
    assert fst_equivalent(fst, back, max_len=5)
    p = tmp_path / "x.fst"
    with open(p, "wb") as f:
        fst.write(f)
    with open(p, "rb") as f:
        back2 = VectorFst.read(f)
    assert fst_equivalent(fst, back2, max_len=5)


def test_native_matches_python():
    """C++ graph plane == Python on random FSTs (skipped if lib not built)."""
    from old_kaldi_git_tpu.fst import native

    if not native.available():
        pytest.skip("native wfst library not built (make -C cpp)")
    rng = random.Random(99)
    checked = 0
    for trial in range(12):
        a = rand_fst(rng, num_states=6, num_arcs=10, functional_ish=True,
                     acyclic=True, eps_prob=0.25)
        if a.start < 0 or a.num_states == 0:
            continue
        det_py = determinize_star(a)
        det_cc = native.determinize_star(a)
        assert fst_equivalent(det_py, det_cc, max_len=6), f"det trial {trial}"
        assert fst_equivalent(
            minimize_encoded(det_py), native.minimize_encoded(det_cc), max_len=6
        ), f"min trial {trial}"
        b = rand_fst(rng, num_states=5, num_arcs=8, functional_ish=True,
                     acyclic=True, eps_prob=0.1)
        if b.start >= 0 and b.num_states:
            assert fst_equivalent(
                compose(a, b), native.compose(a, b), max_len=6
            ), f"compose trial {trial}"
        checked += 1
    assert checked >= 5


def test_replace_fst_expands_nonterminals():
    """RTN expansion (grammar-fst role): 'a N c' with N → (b1 | b2/0.5)
    accepts exactly {a b1 c, a b2 c} at the right weights."""
    from old_kaldi_git_tpu.fst.algorithms import (
        fst_equivalent,
        replace_fst,
        shortest_path,
    )
    from old_kaldi_git_tpu.fst.vector_fst import Arc, VectorFst, linear_fst

    A, B1, B2, C, N = 1, 2, 3, 4, 100
    top = linear_fst([A, N, C])
    sub = VectorFst()
    s0, s1 = sub.add_state(), sub.add_state()
    sub.set_start(s0)
    sub.add_arc(s0, Arc(B1, B1, 0.0, s1))
    sub.add_arc(s0, Arc(B2, B2, 0.5, s1))
    sub.set_final(s1)
    out = replace_fst(top, {N: sub})
    # manual expansion for comparison
    want = VectorFst()
    states = [want.add_state() for _ in range(4)]
    want.set_start(states[0])
    want.add_arc(states[0], Arc(A, A, 0.0, states[1]))
    want.add_arc(states[1], Arc(B1, B1, 0.0, states[2]))
    want.add_arc(states[1], Arc(B2, B2, 0.5, states[2]))
    want.add_arc(states[2], Arc(C, C, 0.0, states[3]))
    want.set_final(states[3])
    assert fst_equivalent(out, want, max_len=6)
    cost, _, olabs = shortest_path(out)
    assert cost == pytest.approx(0.0)
    assert [o for o in olabs if o] == [A, B1, C]


def test_replace_fst_nested_and_recursive():
    """Nested nonterminals expand transitively; recursion raises."""
    from old_kaldi_git_tpu.fst.algorithms import replace_fst, shortest_path
    from old_kaldi_git_tpu.fst.vector_fst import linear_fst
    from old_kaldi_git_tpu.utils.log import KaldiError

    W, X, Y = 1, 100, 101
    top = linear_fst([X])
    sub_x = linear_fst([Y, W])
    sub_y = linear_fst([W, W])
    out = replace_fst(top, {X: sub_x, Y: sub_y})
    _, _, olabs = shortest_path(out)
    assert [o for o in olabs if o] == [W, W, W]
    with pytest.raises(KaldiError):
        replace_fst(top, {X: sub_x, Y: linear_fst([X])})


# ---------------------------------------------------------------------------
# native graph-plane pipeline ops (round-2 additions for large graphs)
# ---------------------------------------------------------------------------

def _require_native():
    from old_kaldi_git_tpu.fst import native

    if not native.available():
        pytest.skip("native wfst library not built (make -C cpp)")
    return native


def test_native_push_special_matches_python():
    native = _require_native()
    rng = random.Random(7)
    for trial in range(6):
        a = rand_fst(rng, num_states=8, num_arcs=16, acyclic=False,
                     eps_prob=0.1)
        if a.start < 0 or a.num_states == 0:
            continue
        a.connect()
        if a.num_states == 0:
            continue
        py = a.copy()
        push_special(py)
        nat = native.NativeFst.from_vector_fst(a)
        nat.push_special()
        back = nat.to_vector_fst()
        assert back.num_states == py.num_states
        for s in range(py.num_states):
            wa = sorted((x.ilabel, x.olabel, x.nextstate, round(x.weight, 4))
                        for x in py.arcs[s])
            wb = sorted((x.ilabel, x.olabel, x.nextstate, round(x.weight, 4))
                        for x in back.arcs[s])
            assert wa == wb, f"trial {trial} state {s}"


def test_native_csr_matches_python():
    import numpy as np

    from old_kaldi_git_tpu.decoder.csr import fst_to_csr, fst_to_csr_native

    native = _require_native()
    rng = random.Random(11)
    checked = 0
    for trial in range(10):
        a = rand_fst(rng, num_states=10, num_arcs=25, acyclic=True,
                     eps_prob=0.35)
        if a.start < 0 or a.num_states == 0:
            continue
        max_label = max(
            (arc.ilabel for s in a.states() for arc in a.arcs[s]), default=0
        )
        tid2pdf = np.arange(max_label + 1, dtype=np.int32)
        py = fst_to_csr(a, tid2pdf)
        nat = fst_to_csr_native(native.NativeFst.from_vector_fst(a), tid2pdf)
        assert py.num_states == nat.num_states
        assert py.num_arcs == nat.num_arcs
        assert (py.row_ptr == nat.row_ptr).all()
        assert (py.tid == nat.tid).all()
        assert (py.nextstate == nat.nextstate).all()
        assert abs(py.weight - nat.weight).max() < 1e-4 if py.num_arcs else True
        assert (
            np.where(np.isfinite(py.final_weight), py.final_weight, -1)
            - np.where(np.isfinite(nat.final_weight), nat.final_weight, -1)
        ).max() < 1e-4
        for i in range(py.num_arcs):
            assert tuple(py.arc_olabels[i]) == tuple(nat.arc_olabels[i])
        for s in range(py.num_states):
            assert tuple(py.final_olabels[s]) == tuple(nat.final_olabels[s])
        checked += 1
    assert checked >= 5


def test_native_compose_context_matches_python():
    """Same window/path language as the Python compose_context (ilabel ids
    may be assigned in a different order; compare via canonical relabeling)."""
    from old_kaldi_git_tpu.fst.context import compose_context

    native = _require_native()
    rng = random.Random(23)

    def canonicalize(fst, ilabel_info):
        # relabel each arc's ilabel to a canonical id: index of its window
        # in the sorted set of all windows
        entries = sorted(
            (tuple(w), i) for i, w in enumerate(ilabel_info) if i > 0 and w
        )
        canon = {i: k + 1 for k, (_w, i) in enumerate(entries)}
        out = fst.copy()
        for s in out.states():
            for a in out.arcs[s]:
                if a.ilabel:
                    a.ilabel = canon[a.ilabel]
        return out

    checked = 0
    for trial in range(8):
        # phone-level acceptor: labels 1..5 phones, 6 = disambig
        a = rand_fst(rng, num_states=7, num_arcs=14, acyclic=True,
                     eps_prob=0.15, num_ilabels=6)
        if a.start < 0 or a.num_states == 0:
            continue
        for N, P in ((1, 0), (2, 1), (3, 1)):
            clg_py, info_py = compose_context(a, N, P, [6], subseq_symbol=99)
            nat_lg = native.NativeFst.from_vector_fst(a)
            nat_clg, info_nat = nat_lg.compose_context(N, P, [6], 99)
            clg_nat = nat_clg.to_vector_fst()
            assert sorted(map(tuple, info_py)) == sorted(map(tuple, info_nat)), \
                f"trial {trial} N={N}"
            assert fst_equivalent(
                canonicalize(clg_py, info_py),
                canonicalize(clg_nat, info_nat),
                max_len=6,
            ), f"trial {trial} N={N}"
        checked += 1
    assert checked >= 4


def test_native_mkgraph_csr_matches_python_triphone():
    """Full native mkgraph pipeline (compose/determinize/push-special/
    context/H/self-loops/CSR) == Python pipeline on a trained triphone
    system: identical graph sizes and identical decodes."""
    import numpy as np

    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.graph import mkgraph, mkgraph_csr
    from old_kaldi_git_tpu.fst.lang import make_unigram_grammar_fst
    from old_kaldi_git_tpu.recipes.decode import (
        DecodeOptions, decode_dataset, score_hyps,
    )
    from old_kaldi_git_tpu.recipes.mono import MonoTrainOptions, train_mono
    from old_kaldi_git_tpu.recipes.triphone import GmmTrainOptions, train_deltas
    from old_kaldi_git_tpu.recipes.yesno import (
        compute_feats, make_corpus, make_lang,
    )

    _require_native()
    tw, tt, sw, st = make_corpus(12, 4)
    tf, sf = compute_feats(tw), compute_feats(sw)
    lang = make_lang()
    mono, ali = train_mono(
        tf, tt, lang, MonoTrainOptions(num_iters=6, totgauss=60)
    )
    tri, ctx_dep, _ = train_deltas(
        tf, tt, lang, mono, ali, num_leaves=40,
        opts=GmmTrainOptions(num_iters=4, totgauss=80),
    )
    assert ctx_dep.N == 3
    g = make_unigram_grammar_fst(list(tt.values()), lang.words)
    csr_py = fst_to_csr(
        mkgraph(lang, g, ctx_dep, tri.tm), tri.tm.tid_to_pdf_array()
    )
    csr_nat = mkgraph_csr(lang, g, ctx_dep, tri.tm)
    assert csr_py.num_states == csr_nat.num_states
    assert csr_py.num_arcs == csr_nat.num_arcs
    h_py = decode_dataset(tri, csr_py, lang, sf, DecodeOptions(beam=20.0))
    h_nat = decode_dataset(tri, csr_nat, lang, sf, DecodeOptions(beam=20.0))
    assert h_py == h_nat
    assert score_hyps(st, h_nat).wer <= score_hyps(st, h_py).wer
