"""Data-dir / info utility tools (the reference's utils/*.pl + *-info rows).

utt2spk-to-spk2utt, spk2utt-to-utt2spk (utils/utt2spk_to_spk2utt.pl and
inverse), validate-data-dir (utils/validate_data_dir.sh), split-data
(utils/split_data.sh), tree-info, am-info, wav-copy, est-pca.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List

import numpy as np

from old_kaldi_git_tpu.bin.tools import tool
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import ParseOptions

log = get_logger("util_tools")


@tool("utt2spk-to-spk2utt")
def utt2spk_to_spk2utt_tool(argv: List[str]) -> int:
    po = ParseOptions("utt2spk-to-spk2utt <utt2spk-file|-> [<spk2utt-file|->]")
    args = po.parse(argv)
    if len(args) not in (1, 2):
        print(po.print_usage(), file=sys.stderr)
        return 1
    fin = sys.stdin if args[0] == "-" else open(args[0])
    spk2utt: dict = {}
    for ln in fin:
        parts = ln.split()
        if len(parts) != 2:
            continue
        spk2utt.setdefault(parts[1], []).append(parts[0])
    if fin is not sys.stdin:
        fin.close()
    out = sys.stdout if len(args) == 1 or args[1] == "-" else open(args[1], "w")
    for spk in sorted(spk2utt):
        out.write(f"{spk} {' '.join(sorted(spk2utt[spk]))}\n")
    if out is not sys.stdout:
        out.close()
    return 0


@tool("spk2utt-to-utt2spk")
def spk2utt_to_utt2spk_tool(argv: List[str]) -> int:
    po = ParseOptions("spk2utt-to-utt2spk <spk2utt-file|-> [<utt2spk-file|->]")
    args = po.parse(argv)
    if len(args) not in (1, 2):
        print(po.print_usage(), file=sys.stderr)
        return 1
    fin = sys.stdin if args[0] == "-" else open(args[0])
    pairs = []
    for ln in fin:
        parts = ln.split()
        for u in parts[1:]:
            pairs.append((u, parts[0]))
    if fin is not sys.stdin:
        fin.close()
    out = sys.stdout if len(args) == 1 or args[1] == "-" else open(args[1], "w")
    for u, s in sorted(pairs):
        out.write(f"{u} {s}\n")
    if out is not sys.stdout:
        out.close()
    return 0


@tool("validate-data-dir")
def validate_data_dir_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.data_dir import DataDir

    po = ParseOptions("validate-data-dir <data-dir>")
    args = po.parse(argv)
    if len(args) != 1:
        print(po.print_usage(), file=sys.stderr)
        return 1
    try:
        d = DataDir(args[0])
        d.validate()
    except KaldiError as e:
        print(f"validate-data-dir: FAILED: {e}", file=sys.stderr)
        return 1
    print(f"validate-data-dir: OK ({len(d.utts)} utterances)")
    return 0


@tool("split-data")
def split_data_tool(argv: List[str]) -> int:
    """Shard a data dir into <data>/split<N>/{1..N}/ keeping speakers
    together (reference utils/split_data.sh)."""
    from old_kaldi_git_tpu.utils.data_dir import DataDir

    po = ParseOptions("split-data <data-dir> <num-splits>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    d = DataDir(args[0])
    n = int(args[1])
    shards = d.split(n)
    maps = ("wav.scp", "text", "utt2spk", "feats.scp", "segments",
            "utt2dur", "cmvn.scp")
    for i, utts in enumerate(shards, start=1):
        sub = os.path.join(args[0], f"split{n}", str(i))
        os.makedirs(sub, exist_ok=True)
        keep = set(utts)
        for name in maps:
            src = os.path.join(args[0], name)
            if not os.path.exists(src):
                continue
            with open(src) as f, open(os.path.join(sub, name), "w") as g:
                for ln in f:
                    parts = ln.split(None, 1)
                    if parts and parts[0] in keep:
                        g.write(ln)
        # spk2utt regenerated from the shard's utt2spk
        u2s = os.path.join(sub, "utt2spk")
        if os.path.exists(u2s):
            spk2utt: dict = {}
            with open(u2s) as f:
                for ln in f:
                    p = ln.split()
                    if len(p) == 2:
                        spk2utt.setdefault(p[1], []).append(p[0])
            with open(os.path.join(sub, "spk2utt"), "w") as g:
                for spk in sorted(spk2utt):
                    g.write(f"{spk} {' '.join(sorted(spk2utt[spk]))}\n")
    log.info("split %d utterances into %d shards", len(d.utts), n)
    return 0


@tool("tree-info")
def tree_info_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.tree.context_dep import ContextDependency

    po = ParseOptions("tree-info <tree-file>")
    args = po.parse(argv)
    if len(args) != 1:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with open(args[0], "rb") as f:
        cd = ContextDependency.read(f)
    print(f"num-pdfs {cd.num_pdfs}")
    print(f"context-width {cd.N}")
    print(f"central-position {cd.P}")
    return 0


@tool("am-info")
def am_info_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel

    po = ParseOptions("am-info <gmm-model>")
    args = po.parse(argv)
    if len(args) != 1:
        print(po.print_usage(), file=sys.stderr)
        return 1
    m = AmGmmModel.load(args[0])
    print(f"number of phones {len(m.tm.topo.phones)}")
    print(f"number of pdfs {m.am.num_pdfs}")
    print(f"number of transition-ids {m.tm.num_tids}")
    print(f"feature dimension {m.am.dim}")
    print(f"number of gaussians {m.am.num_gauss}")
    return 0


@tool("wav-copy")
def wav_copy_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("wav-copy <wav-rspecifier> <wav-wspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    n = 0
    with TableWriter(args[1], "wav") as w:
        for key, wave in SequentialTableReader(args[0], "wav"):
            w[key] = wave
            n += 1
    log.info("copied %d waves", n)
    return 0


@tool("est-pca")
def est_pca_tool(argv: List[str]) -> int:
    """PCA transform from features (reference bin/est-pca.cc; used for
    i-vector whitening and dimension reduction)."""
    from old_kaldi_git_tpu.utils.io_funcs import BINARY_HEADER, write_matrix
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions("est-pca [options] <feats-rspecifier> <pca-matrix-out>")

    class Opts:
        dim = 0  # 0 = keep all
        normalize_variance = False
        normalize_mean = True

    o = Opts()
    po.register("dim", o, "dim")
    po.register("normalize-variance", o, "normalize_variance")
    po.register("normalize-mean", o, "normalize_mean")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    n = 0
    s1 = s2 = None
    for _k, f in SequentialTableReader(args[0], "mat"):
        f = np.asarray(f, np.float64)
        if s1 is None:
            s1 = f.sum(0)
            s2 = f.T @ f
        else:
            s1 += f.sum(0)
            s2 += f.T @ f
        n += f.shape[0]
    if not n:
        log.error("no features")
        return 1
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    dim = o.dim if o.dim > 0 else len(evals)
    T = evecs[:, :dim].T  # [dim, D]
    if o.normalize_variance:
        T = T / np.sqrt(np.maximum(evals[:dim], 1e-10))[:, None]
    if o.normalize_mean:
        # affine: append -T @ mean as the last column (Kaldi convention)
        T = np.concatenate([T, (-T @ mean)[:, None]], axis=1)
    with open(args[1], "wb") as fo:
        fo.write(BINARY_HEADER)
        write_matrix(fo, T.astype(np.float32))
    log.info("PCA: %d frames, kept %d of %d dims (top eval %.3g)",
             n, dim, len(evals), float(evals[0]))
    return 0


@tool("modify-cmvn-stats")
def modify_cmvn_stats_tool(argv: List[str]) -> int:
    """Fake/zero selected dimensions of CMVN stats (src/featbin/
    modify-cmvn-stats.cc: used to disable normalization of some dims, e.g.
    pitch, by making them look like zero-mean unit-variance)."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "modify-cmvn-stats [options] <fake-dims-colon|''> "
        "<stats-rspecifier> <stats-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    fake = [int(x) for x in args[0].split(":") if x]
    with TableWriter(args[2], "mat") as w:
        for key, st in SequentialTableReader(args[1], "mat"):
            st = np.array(st, np.float64)
            dim = st.shape[1] - 1
            count = st[0, dim]
            for d in fake:
                if 0 <= d < dim:
                    st[0, d] = 0.0  # sum → mean 0
                    st[1, d] = count  # sumsq → variance 1
            w[key] = st
    return 0


@tool("extract-feature-segments")
def extract_feature_segments_tool(argv: List[str]) -> int:
    """Cut feature matrices by a segments file (frame ranges from times;
    src/featbin/extract-feature-segments.cc)."""
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "extract-feature-segments [options] <feats-rspecifier> "
        "<segments-file> <feats-wspecifier>"
    )

    class Opts:
        frame_shift = 0.01

    o = Opts()
    po.register("frame-shift", o, "frame_shift")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    feats = RandomAccessTableReader(args[0], "mat")
    n = 0
    with TableWriter(args[2], "mat") as w:
        with open(args[1]) as f:
            for ln in f:
                parts = ln.split()
                if len(parts) != 4:
                    continue
                seg, rec, t0, t1 = parts[0], parts[1], float(parts[2]), float(parts[3])
                if rec not in feats:
                    log.warning("no features for recording %s", rec)
                    continue
                m = feats[rec]
                lo = int(round(t0 / o.frame_shift))
                hi = min(int(round(t1 / o.frame_shift)), m.shape[0])
                if hi - lo < 1:
                    log.warning("empty segment %s", seg)
                    continue
                w[seg] = m[lo:hi]
                n += 1
    log.info("extracted %d feature segments", n)
    return 0


@tool("show-alignments")
def show_alignments_tool(argv: List[str]) -> int:
    """Human-readable alignments: per-utterance phone segments with frame
    spans (src/bin/show-alignments.cc, simplified)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.hmm.hmm_utils import split_to_phones
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "show-alignments <phones-symtab|''> <model> <ali-rspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    phones_tab = None
    if args[0]:
        from old_kaldi_git_tpu.fst.symbols import SymbolTable

        phones_tab = SymbolTable.read(args[0])
    tm = AmGmmModel.load(args[1]).tm
    for key, ali in SequentialTableReader(args[2], "ivec"):
        t = 0
        parts = []
        for seg in split_to_phones(tm, ali):
            ph = tm.tid_to_phone(seg[0])
            name = phones_tab[ph] if phones_tab else str(ph)
            parts.append(f"{name}[{t}:{t + len(seg)}]")
            t += len(seg)
        print(f"{key} {' '.join(parts)}")
    return 0


@tool("ivector-extract-online2")
def ivector_extract_online2_tool(argv: List[str]) -> int:
    """Online i-vectors re-estimated every --ivector-period frames from
    cumulative stats (src/online2bin/ivector-extract-online2.cc; output
    rows repeat within each period like the reference feature)."""
    from old_kaldi_git_tpu.ivector.extractor import (
        IvectorExtractor,
        extract_online_ivectors,
    )
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "ivector-extract-online2 [options] <extractor> <feats-rspecifier> "
        "<ivectors-wspecifier>"
    )

    class Opts:
        ivector_period = 10
        max_count = 0.0
        stats_scale = 1.0

    o = Opts()
    po.register("ivector-period", o, "ivector_period")
    po.register("max-count", o, "max_count")
    po.register("stats-scale", o, "stats_scale")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    ext = IvectorExtractor.load(args[0])
    n = 0
    with TableWriter(args[2], "mat") as w:
        for key, f in SequentialTableReader(args[1], "mat"):
            w[key] = extract_online_ivectors(
                ext, np.asarray(f, np.float32), o.ivector_period,
                o.stats_scale, o.max_count,
            )
            n += 1
    log.info("extracted online ivectors for %d utterances", n)
    return 0


def _usage(po) -> int:
    print(po.print_usage(), file=sys.stderr)
    return 1


@tool("fstaddselfloops")
def fstaddselfloops_tool(argv: List[str]) -> int:
    """Add disambiguation-symbol self-loops
    (reference fstbin/fstaddselfloops.cc): reads parallel lists of input
    and output disambig ids, loops added at start/final/word-emitting
    states."""
    from old_kaldi_git_tpu.fst.algorithms import add_disambig_self_loops
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst

    po = ParseOptions(
        "fstaddselfloops <disambig-in-list> <disambig-out-list> "
        "[<fst-in> [<fst-out>]]  (lists: files of integer ids)"
    )
    args = po.parse(argv)
    if len(args) < 2 or len(args) > 4:
        return _usage(po)

    def read_ids(path):
        with open(path) as f:
            return [int(tok) for tok in f.read().split()]

    isyms, osyms = read_ids(args[0]), read_ids(args[1])
    if len(isyms) != len(osyms):
        raise KaldiError("disambig lists differ in length")
    fst_in = args[2] if len(args) > 2 else "-"
    fst_out = args[3] if len(args) > 3 else "-"
    if fst_in == "-":
        fst = VectorFst.read(sys.stdin.buffer)
    else:
        with open(fst_in, "rb") as f:
            fst = VectorFst.read(f)
    add_disambig_self_loops(fst, list(zip(isyms, osyms)))
    if fst_out == "-":
        fst.write(sys.stdout.buffer)
        sys.stdout.buffer.flush()
    else:
        with open(fst_out, "wb") as f:
            fst.write(f)
    return 0


@tool("draw-tree")
def draw_tree_tool(argv: List[str]) -> int:
    """Graphviz dot rendering of the phonetic decision tree
    (reference bin/draw-tree.cc).  Phones are named via the symbol table;
    key -1 is the pdf-class, other keys are context positions."""
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.tree.context_dep import ContextDependency
    from old_kaldi_git_tpu.tree.event_map import (
        ConstantEventMap,
        SplitEventMap,
        TableEventMap,
    )

    po = ParseOptions("draw-tree <phone-symbol-table> <tree-file>")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    syms = SymbolTable.read(args[0])
    with open(args[1], "rb") as f:
        cd = ContextDependency.read(f)

    lines = ["digraph tree {", "  node [shape=box];"]
    counter = [0]

    def name_phone(v: int) -> str:
        return str(syms.get(v, v))

    def walk(em) -> str:
        nid = f"n{counter[0]}"
        counter[0] += 1
        if isinstance(em, ConstantEventMap):
            lines.append(f'  {nid} [shape=ellipse, label="pdf {em.answer}"];')
        elif isinstance(em, SplitEventMap):
            key = ("pdf-class" if em.key == -1
                   else f"ctx[{em.key}]")
            vals = sorted(em.yes_set)
            shown = ",".join(
                name_phone(v) if em.key != -1 else str(v) for v in vals[:8])
            if len(vals) > 8:
                shown += ",..."
            lines.append(f'  {nid} [label="{key} in {{{shown}}}?"];')
            y = walk(em.yes)
            n = walk(em.no)
            lines.append(f'  {nid} -> {y} [label="yes"];')
            lines.append(f'  {nid} -> {n} [label="no"];')
        elif isinstance(em, TableEventMap):
            key = "pdf-class" if em.key == -1 else f"ctx[{em.key}]"
            lines.append(f'  {nid} [label="table on {key}"];')
            for v, sub in sorted(em.table.items()):
                c = walk(sub)
                lab = name_phone(v) if em.key != -1 else str(v)
                lines.append(f'  {nid} -> {c} [label="{lab}"];')
        else:
            lines.append(f'  {nid} [label="{type(em).__name__}"];')
        return nid

    walk(cd.root)
    lines.append("}")
    print("\n".join(lines))
    return 0


@tool("analyze-counts")
def analyze_counts_tool(argv: List[str]) -> int:
    """Count occurrences of integer ids in alignments and print a Kaldi
    vector (reference bin/analyze-counts.cc; used for prior estimation and
    data checks)."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "analyze-counts [options] <int-vector-rspecifier> <counts-out|->")

    class Opts:
        binary = False
        counts_dim = 0

    o = Opts()
    po.register("counts-dim", o, "counts_dim")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    counts: Dict[int, int] = {}
    n_utts = 0
    for _key, vec in SequentialTableReader(args[0], "ivec"):
        n_utts += 1
        for v in np.asarray(vec).tolist():
            counts[int(v)] = counts.get(int(v), 0) + 1
    dim = max(o.counts_dim, (max(counts) + 1) if counts else 0)
    arr = np.zeros(dim, np.float64)
    for k, c in counts.items():
        arr[k] = c
    text = "[ " + " ".join(str(int(x)) for x in arr) + " ]"
    if args[1] == "-":
        print(text)
    else:
        with open(args[1], "w") as f:
            f.write(text + "\n")
    log.info("analyze-counts: %d utterances, %d distinct ids, %d frames",
             n_utts, len(counts), int(arr.sum()))
    return 0


@tool("fstrand")
def fstrand_tool(argv: List[str]) -> int:
    """Write a random FST (reference fstbin/fstrand.cc / fstext/rand-fst.h
    — the equivalence-test generator)."""
    import random

    from old_kaldi_git_tpu.bin.tools import _write_fst
    from old_kaldi_git_tpu.fst.rand import rand_fst

    po = ParseOptions("fstrand [options] <fst-out>")

    class Opts:
        num_states = 6
        num_arcs = 10
        num_labels = 3
        seed = 0
        acyclic = False

    o = Opts()
    po.register("num-states", o, "num_states")
    po.register("num-arcs", o, "num_arcs")
    po.register("num-labels", o, "num_labels")
    po.register("srand", o, "seed")
    po.register("acyclic", o, "acyclic")
    args = po.parse(argv)
    if len(args) != 1:
        return _usage(po)
    fst = rand_fst(random.Random(o.seed), o.num_states, o.num_arcs,
                   o.num_labels, o.num_labels, acyclic=o.acyclic)
    return _write_fst(fst, args[0])


@tool("subset-feats")
def subset_feats_tool(argv: List[str]) -> int:
    """Copy a subset of a feature table (reference featbin/subset-feats.cc:
    first --n utterances, or --include list)."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "subset-feats [options] <feats-rspecifier> <feats-wspecifier>")

    class Opts:
        n = 10
        include = ""

    o = Opts()
    po.register("n", o, "n")
    po.register("include", o, "include")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    include = None
    if o.include:
        with open(o.include) as f:
            include = {line.split()[0] for line in f if line.strip()}
    n = 0
    with TableWriter(args[1], "mat") as w:
        for key, m in SequentialTableReader(args[0], "mat"):
            if include is not None:
                if key not in include:
                    continue
            elif n >= o.n:
                break
            w[key] = m
            n += 1
    log.info("subset-feats: wrote %d utterances", n)
    return 0


@tool("feat-to-post")
def feat_to_post_tool(argv: List[str]) -> int:
    """Feature rows → posterior entries (reference featbin/feat-to-post.cc:
    per frame the --top-n largest (index, value) pairs — the generic NN
    soft-target format)."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "feat-to-post [options] <feats-rspecifier> <post-wspecifier>")

    class Opts:
        top_n = 10

    o = Opts()
    po.register("top-n", o, "top_n")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    with TableWriter(args[1], "post") as w:
        for key, m in SequentialTableReader(args[0], "mat"):
            m = np.asarray(m)
            k = min(o.top_n, m.shape[1])
            idx = np.argpartition(-m, k - 1, axis=1)[:, :k]
            post = []
            for t in range(len(m)):
                cols = sorted(int(c) for c in idx[t])
                post.append([(c, float(m[t, c])) for c in cols])
            w[key] = post
    return 0


# ---------------------------------------------------------------------------
# utils/ script family (reference utils/sym2int.pl, int2sym.pl,
# apply_map.pl, filter_scp.pl, subset_data_dir.sh, compute-wer-bootci)
# ---------------------------------------------------------------------------


def _open_r(path: str):
    return sys.stdin if path == "-" else open(path)


def _open_w(path: str):
    return sys.stdout if path == "-" else open(path, "w")


@tool("sym2int")
def sym2int_tool(argv: List[str]) -> int:
    """Map symbols → integer ids using a symbol table
    (reference utils/sym2int.pl; -f 2- skips the utterance id)."""
    from old_kaldi_git_tpu.fst.symbols import SymbolTable

    po = ParseOptions("sym2int [options] <symtab> <text-in|-> <text-out|->")

    class Opts:
        map_oov = ""
        skip_first_field = True

    o = Opts()
    po.register("map-oov", o, "map_oov")
    po.register("skip-first-field", o, "skip_first_field")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    syms = SymbolTable.read(args[0])
    oov = syms[o.map_oov] if o.map_oov else None
    n_oov = 0
    fin, fout = _open_r(args[1]), _open_w(args[2])
    try:
        for line in fin:
            parts = line.split()
            start = 1 if (o.skip_first_field and parts) else 0
            out = parts[:start]
            for w in parts[start:]:
                if w in syms:
                    out.append(str(syms[w]))
                elif oov is not None:
                    out.append(str(oov))
                    n_oov += 1
                else:
                    raise KaldiError(
                        f"sym2int: OOV {w!r} and no --map-oov given")
            fout.write(" ".join(out) + "\n")
    finally:
        if fin is not sys.stdin:
            fin.close()
        if fout is not sys.stdout:
            fout.close()
    if n_oov:
        log.warning("sym2int: mapped %d OOV tokens", n_oov)
    return 0


@tool("int2sym")
def int2sym_tool(argv: List[str]) -> int:
    """Map integer ids → symbols (reference utils/int2sym.pl)."""
    from old_kaldi_git_tpu.fst.symbols import SymbolTable

    po = ParseOptions("int2sym [options] <symtab> <text-in|-> <text-out|->")

    class Opts:
        skip_first_field = True

    o = Opts()
    po.register("skip-first-field", o, "skip_first_field")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    syms = SymbolTable.read(args[0])
    fin, fout = _open_r(args[1]), _open_w(args[2])
    try:
        for line in fin:
            parts = line.split()
            start = 1 if (o.skip_first_field and parts) else 0
            out = parts[:start] + [syms[int(w)] for w in parts[start:]]
            fout.write(" ".join(out) + "\n")
    finally:
        if fin is not sys.stdin:
            fin.close()
        if fout is not sys.stdout:
            fout.close()
    return 0


@tool("apply-map")
def apply_map_tool(argv: List[str]) -> int:
    """Replace each token (beyond the key) via a map file
    (reference utils/apply_map.pl); --permissive keeps unmapped tokens."""
    from old_kaldi_git_tpu.utils.data_dir import _read_map

    po = ParseOptions("apply-map [options] <map-file> <text-in|-> <text-out|->")

    class Opts:
        permissive = False

    o = Opts()
    po.register("permissive", o, "permissive")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    mapping = _read_map(args[0])
    fin, fout = _open_r(args[1]), _open_w(args[2])
    try:
        for line in fin:
            parts = line.split()
            out = parts[:1]
            for w in parts[1:]:
                if w in mapping:
                    out.append(mapping[w])
                elif o.permissive:
                    out.append(w)
                else:
                    raise KaldiError(f"apply-map: no mapping for {w!r}")
            fout.write(" ".join(out) + "\n")
    finally:
        if fin is not sys.stdin:
            fin.close()
        if fout is not sys.stdout:
            fout.close()
    return 0


@tool("filter-scp")
def filter_scp_tool(argv: List[str]) -> int:
    """Keep lines whose key appears in an id list
    (reference utils/filter_scp.pl; --exclude inverts)."""
    po = ParseOptions("filter-scp [options] <id-list> <in|-> <out|->")

    class Opts:
        exclude = False

    o = Opts()
    po.register("exclude", o, "exclude")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    with open(args[0]) as f:
        ids = {line.split()[0] for line in f if line.strip()}
    fin, fout = _open_r(args[1]), _open_w(args[2])
    n = 0
    try:
        for line in fin:
            parts = line.split()
            if not parts:
                continue
            if (parts[0] in ids) != o.exclude:
                fout.write(line if line.endswith("\n") else line + "\n")
                n += 1
    finally:
        if fin is not sys.stdin:
            fin.close()
        if fout is not sys.stdout:
            fout.close()
    log.info("filter-scp: kept %d lines", n)
    return 0


@tool("subset-data-dir")
def subset_data_dir_tool(argv: List[str]) -> int:
    """Subset a data dir (reference utils/subset_data_dir.sh): first N
    utterances, --utt-list, or --per-spk N utterances per speaker."""
    from old_kaldi_git_tpu.utils.data_dir import DataDir, _write_map

    po = ParseOptions(
        "subset-data-dir [options] <src-data-dir> <n> <dest-data-dir>")

    class Opts:
        utt_list = ""
        per_spk = False

    o = Opts()
    po.register("utt-list", o, "utt_list")
    po.register("per-spk", o, "per_spk")
    args = po.parse(argv)
    if len(args) != 3:
        return _usage(po)
    src = DataDir(args[0], require_text=False)
    n = int(args[1])
    if o.utt_list:
        have = set(src.utts)
        with open(o.utt_list) as f:
            keep = [line.split()[0] for line in f if line.strip()]
        keep = [u for u in keep if u in have]
    elif o.per_spk:
        keep = []
        for spk, utts in sorted(src.spk2utt.items()):
            keep.extend(sorted(utts)[:n])
    else:
        keep = sorted(src.utts)[:n]
    keep_set = set(keep)
    os.makedirs(args[2], exist_ok=True)
    for name, mapping in (("wav.scp", src.wav_scp), ("text", src.text),
                          ("utt2spk", src.utt2spk),
                          ("feats.scp", src.feats_scp),
                          ("segments", src.segments)):
        if mapping:
            _write_map(os.path.join(args[2], name),
                       {k: v for k, v in mapping.items() if k in keep_set})
    log.info("subset-data-dir: %d of %d utterances", len(keep),
             len(src.utts))
    return 0


@tool("compute-wer-bootci")
def compute_wer_bootci_tool(argv: List[str]) -> int:
    """WER with a bootstrap confidence interval
    (reference bin/compute-wer-bootci.cc, Bisani & Ney 2004): resample
    utterances with replacement, report the 95% interval."""
    from old_kaldi_git_tpu.utils.edit_distance import edit_distance
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "compute-wer-bootci [options] <ref-rspecifier> <hyp-rspecifier>")

    class Opts:
        replications = 10000
        seed = 0

    o = Opts()
    po.register("replications", o, "replications")
    po.register("srand", o, "seed")
    args = po.parse(argv)
    if len(args) != 2:
        return _usage(po)
    refs = dict(SequentialTableReader(args[0], "text"))
    hyps = dict(SequentialTableReader(args[1], "text"))
    keys = sorted(set(refs) & set(hyps))
    if not keys:
        raise KaldiError("no overlapping utterances")
    errs = np.asarray([
        edit_distance(refs[k].split(), hyps[k].split()).errors for k in keys
    ], np.float64)
    lens = np.asarray([len(refs[k].split()) for k in keys], np.float64)
    wer = 100.0 * errs.sum() / max(lens.sum(), 1.0)
    rng = np.random.default_rng(o.seed)
    idx = rng.integers(0, len(keys), size=(o.replications, len(keys)))
    boot = 100.0 * errs[idx].sum(axis=1) / np.maximum(
        lens[idx].sum(axis=1), 1.0)
    lo, hi = np.percentile(boot, [2.5, 97.5])
    print(f"Set up with {len(keys)} utterances.")
    print(f"WER {wer:.2f} 95% conf interval [ {lo:.2f}, {hi:.2f} ]")
    return 0
