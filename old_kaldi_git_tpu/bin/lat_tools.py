"""Second batch of CLI tools: latbin / posterior / vector / fst / lm extras.

Thin wrappers over the library, mirroring the reference binaries they are
named after (SURVEY.md §2.5 latbin, §2.7 bin rows).  Registered as an import
side-effect from old_kaldi_git_tpu.bin.tools.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Tuple

import numpy as np

from old_kaldi_git_tpu.bin.tools import _jnp, _read_fst, _write_fst, tool
from old_kaldi_git_tpu.utils.log import get_logger
from old_kaldi_git_tpu.utils.parse_options import ParseOptions

log = get_logger("lat_tools")


# ---------------------------------------------------------------------------
# latbin
# ---------------------------------------------------------------------------

@tool("lattice-1best")
def lattice_1best_tool(argv: List[str]) -> int:
    """Best path per lattice as a linear lattice (src/latbin/lattice-1best.cc)."""
    from old_kaldi_git_tpu.lat.lattice import (
        lattice_nbest_paths,
        linear_lattice_from_path,
    )
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("lattice-1best [options] <lat-rspecifier> <lat-wspecifier>")

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.1

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "lat") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            paths = lattice_nbest_paths(lat, 1, o.lm_scale, o.acoustic_scale)
            if not paths:
                log.warning("empty lattice for %s", key)
                continue
            w[key] = linear_lattice_from_path(*paths[0])
    return 0


@tool("lattice-copy")
def lattice_copy_tool(argv: List[str]) -> int:
    """Copy lattices between archives (src/latbin/lattice-copy.cc);
    --compact copies CompactLattice archives instead."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("lattice-copy [options] <lat-rspecifier> <lat-wspecifier>")

    class Opts:
        compact = False

    o = Opts()
    po.register("compact", o, "compact")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    holder = "clat" if o.compact else "lat"
    n = 0
    with TableWriter(args[1], holder) as w:
        for key, lat in SequentialTableReader(args[0], holder):
            w[key] = lat
            n += 1
    log.info("copied %d lattices", n)
    return 0


@tool("lattice-add-penalty")
def lattice_add_penalty_tool(argv: List[str]) -> int:
    """Add a word insertion penalty to the graph cost of every word arc
    (src/latbin/lattice-add-penalty.cc AddWordInsPenToCompactLattice)."""
    from old_kaldi_git_tpu.lat.lattice import LatticeArc
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-add-penalty [options] <lat-rspecifier> <lat-wspecifier>"
    )

    class Opts:
        word_ins_penalty = 0.0

    o = Opts()
    po.register("word-ins-penalty", o, "word_ins_penalty")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "lat") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            for s in range(lat.num_states):
                lat.arcs[s] = [
                    LatticeArc(a.ilabel, a.olabel,
                               a.graph_cost + (o.word_ins_penalty
                                               if a.olabel else 0.0),
                               a.acoustic_cost, a.nextstate)
                    for a in lat.arcs[s]
                ]
            w[key] = lat
    return 0


@tool("lattice-rmali")
def lattice_rmali_tool(argv: List[str]) -> int:
    """Strip transition-id alignments (src/latbin/lattice-rmali.cc)."""
    from old_kaldi_git_tpu.lat.lattice import LatticeArc
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("lattice-rmali <lat-rspecifier> <lat-wspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "lat") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            for s in range(lat.num_states):
                lat.arcs[s] = [
                    LatticeArc(0, a.olabel, a.graph_cost, a.acoustic_cost,
                               a.nextstate)
                    for a in lat.arcs[s]
                ]
            w[key] = lat
    return 0


@tool("lattice-to-post")
def lattice_to_post_tool(argv: List[str]) -> int:
    """Per-frame pdf posteriors from lattices (src/latbin/lattice-to-post.cc
    + bin/post-to-pdf-post combined, as our Posterior is pdf-level here)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.lat.lattice import lattice_to_post
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-to-post [options] <model> <lat-rspecifier> <post-wspecifier>"
    )

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.1
        min_post = 0.01

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    po.register("min-post", o, "min_post")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    tm = AmGmmModel.load(args[0]).tm
    with TableWriter(args[2], "post") as w:
        for key, lat in SequentialTableReader(args[1], "lat"):
            w[key] = lattice_to_post(
                lat, tm, o.lm_scale, o.acoustic_scale, o.min_post
            )
    return 0


@tool("lattice-to-ctm-conf")
def lattice_to_ctm_conf_tool(argv: List[str]) -> int:
    """One-best CTM with word times + confidences
    (src/latbin/lattice-to-ctm-conf.cc).  Writes CTM text lines."""
    from old_kaldi_git_tpu.fst.lang import load_lang_dir
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.lat.ctm import lattice_to_ctm_conf
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "lattice-to-ctm-conf [options] <model> <lang-dir> <lat-rspecifier> "
        "<ctm-file|->"
    )

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.1
        frame_shift = 0.01

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    po.register("frame-shift", o, "frame_shift")
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    tm = AmGmmModel.load(args[0]).tm
    lang = load_lang_dir(args[1])
    out = sys.stdout if args[3] == "-" else open(args[3], "w")
    try:
        for key, lat in SequentialTableReader(args[2], "lat"):
            for e in lattice_to_ctm_conf(
                lat, tm, lang, utt=key, lm_scale=o.lm_scale,
                ac_scale=o.acoustic_scale, frame_shift=o.frame_shift,
            ):
                out.write(e.line() + "\n")
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


@tool("lattice-align-words-lexicon")
def lattice_align_words_lexicon_tool(argv: List[str]) -> int:
    """Word time alignment of the best path via the lexicon
    (src/latbin/lattice-align-words-lexicon.cc role); writes per-utterance
    'word start_frame num_frames' triples."""
    from old_kaldi_git_tpu.fst.lang import load_lang_dir
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.lat.ctm import align_words_lexicon
    from old_kaldi_git_tpu.lat.lattice import lattice_best_path
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-align-words-lexicon [options] <lang-dir> <model> "
        "<lat-rspecifier> <align-wspecifier>"
    )

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.1

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    lang = load_lang_dir(args[0])
    tm = AmGmmModel.load(args[1]).tm
    n_done = n_err = 0
    with TableWriter(args[3], "text") as w:
        for key, lat in SequentialTableReader(args[2], "lat"):
            words, tids, _ = lattice_best_path(lat, o.lm_scale,
                                               o.acoustic_scale)
            try:
                ali = align_words_lexicon(tm, lang, words, tids)
            except Exception as e:  # noqa: BLE001 — per-utt robustness
                log.warning("alignment failed for %s: %s", key, e)
                n_err += 1
                continue
            w[key] = " ; ".join(f"{w_} {s} {n}" for w_, s, n in ali)
            n_done += 1
    log.info("aligned %d lattices (%d failed)", n_done, n_err)
    return 0 if n_err == 0 else (0 if n_done else 1)


@tool("lattice-to-fst")
def lattice_to_fst_tool(argv: List[str]) -> int:
    """Word acceptor FSTs from lattices (src/latbin/lattice-to-fst.cc;
    costs combined with the given scales)."""
    from old_kaldi_git_tpu.lat.lattice import lattice_to_word_fst
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-to-fst [options] <lat-rspecifier> <fst-wspecifier>"
    )

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.0

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "fst") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            w[key] = lattice_to_word_fst(lat, o.lm_scale, o.acoustic_scale)
    return 0


@tool("lattice-determinize")
def lattice_determinize_tool(argv: List[str]) -> int:
    """Determinize lattices to CompactLattices, keeping only the best
    alignment per word sequence (src/latbin/lattice-determinize.cc)."""
    from old_kaldi_git_tpu.lat.determinize import determinize_lattice
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-determinize [options] <lat-rspecifier> <clat-wspecifier>"
    )

    class Opts:
        num_threads = 1

    o = Opts()
    po.register("num-threads", o, "num_threads")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    # per-utterance determinization is independent; with the native
    # (ctypes, GIL-releasing) backend the ordered host pool gives real
    # parallelism (TaskSequencer role, utils/threads.py)
    from old_kaldi_git_tpu.utils.threads import map_ordered

    pairs = SequentialTableReader(args[0], "lat")

    def work(kv):
        key, lat = kv
        return key, determinize_lattice(lat)

    with TableWriter(args[1], "clat") as w:
        for key, clat in map_ordered(work, pairs, o.num_threads):
            w[key] = clat
    return 0


@tool("lattice-push")
def lattice_push_tool(argv: List[str]) -> int:
    """Push CompactLattice weights toward the start
    (src/latbin/lattice-push.cc)."""
    from old_kaldi_git_tpu.lat.determinize import push_compact_lattice
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("lattice-push <clat-rspecifier> <clat-wspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "clat") as w:
        for key, clat in SequentialTableReader(args[0], "clat"):
            w[key] = push_compact_lattice(clat)
    return 0


@tool("lattice-minimize")
def lattice_minimize_tool(argv: List[str]) -> int:
    """Minimize deterministic CompactLattices (src/latbin/lattice-minimize.cc)."""
    from old_kaldi_git_tpu.lat.determinize import minimize_compact_lattice
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("lattice-minimize <clat-rspecifier> <clat-wspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "clat") as w:
        for key, clat in SequentialTableReader(args[0], "clat"):
            w[key] = minimize_compact_lattice(clat)
    return 0


@tool("lattice-lmrescore")
def lattice_lmrescore_tool(argv: List[str]) -> int:
    """Add a scaled LM score to CompactLattices; use a negative scale to
    remove the old LM (src/latbin/lattice-lmrescore.cc semantics, exact
    composition with the ARPA/const-arpa LM instead of an FST G)."""
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.lat.rescore import lmrescore_compact_lattice
    from old_kaldi_git_tpu.lm.arpa import load_lm
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-lmrescore [options] --words=words.txt <clat-rspecifier> "
        "<lm-file> <clat-wspecifier>"
    )

    class Opts:
        lm_scale = 1.0
        words = ""

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("words", o, "words")
    args = po.parse(argv)
    if len(args) != 3 or not o.words:
        print(po.print_usage(), file=sys.stderr)
        return 1
    lm = load_lm(args[1])
    words = SymbolTable.read(o.words)
    with TableWriter(args[2], "clat") as w:
        for key, clat in SequentialTableReader(args[0], "clat"):
            w[key] = lmrescore_compact_lattice(
                clat, words, lm, new_scale=o.lm_scale
            )
    return 0


# _rescore_lattice_acoustics moved to lat/rescore.py (library code used
# by nnet3 discriminative training too); re-exported here for the tools
from old_kaldi_git_tpu.lat.rescore import (  # noqa: E402  (isort:skip)
    rescore_lattice_acoustics as _rescore_lattice_acoustics,
)


@tool("lattice-rescore-mapped")
def lattice_rescore_mapped_tool(argv: List[str]) -> int:
    """Replace lattice acoustic scores from a precomputed log-likelihood
    matrix (src/latbin/lattice-rescore-mapped.cc)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "lattice-rescore-mapped <model> <lat-rspecifier> "
        "<loglikes-rspecifier> <lat-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    tm = AmGmmModel.load(args[0]).tm
    likes = RandomAccessTableReader(args[2], "mat")
    n = 0
    with TableWriter(args[3], "lat") as w:
        for key, lat in SequentialTableReader(args[1], "lat"):
            if key not in likes:
                log.warning("no loglikes for %s", key)
                continue
            _rescore_lattice_acoustics(lat, likes[key], tm.tid_to_pdf)
            w[key] = lat
            n += 1
    log.info("rescored %d lattices", n)
    return 0


@tool("gmm-rescore-lattice")
def gmm_rescore_lattice_tool(argv: List[str]) -> int:
    """Replace lattice acoustic scores using a GMM model over features
    (src/gmmbin/gmm-rescore-lattice.cc)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "gmm-rescore-lattice <model> <lat-rspecifier> <feats-rspecifier> "
        "<lat-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    model = AmGmmModel.load(args[0])
    feats = RandomAccessTableReader(args[2], "mat")
    n = 0
    with TableWriter(args[3], "lat") as w:
        for key, lat in SequentialTableReader(args[1], "lat"):
            if key not in feats:
                log.warning("no features for %s", key)
                continue
            ll = model.am.loglikes_numpy(feats[key])
            _rescore_lattice_acoustics(lat, ll, model.tm.tid_to_pdf)
            w[key] = lat
            n += 1
    log.info("rescored %d lattices", n)
    return 0


@tool("lattice-boost-ali")
def lattice_boost_ali_tool(argv: List[str]) -> int:
    """Boosted-MMI lattices: subtract b × (#frame phone errors vs the
    alignment) from each arc's graph cost (src/latbin/lattice-boost-ali.cc)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.lat.lattice import LatticeArc
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "lattice-boost-ali [options] <model> <lat-rspecifier> "
        "<ali-rspecifier> <lat-wspecifier>"
    )

    class Opts:
        b = 0.05
        silence_phones = ""
        max_silence_error = 0.0

    o = Opts()
    po.register("b", o, "b")
    po.register("silence-phones", o, "silence_phones")
    po.register("max-silence-error", o, "max_silence_error")
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    tm = AmGmmModel.load(args[0]).tm
    sil = {int(x) for x in o.silence_phones.split(":") if x}
    alis = RandomAccessTableReader(args[2], "ivec")
    n = 0
    with TableWriter(args[3], "lat") as w:
        for key, lat in SequentialTableReader(args[1], "lat"):
            if key not in alis:
                log.warning("no alignment for %s", key)
                continue
            ref_phones = [tm.tid_to_phone(int(t)) for t in alis[key]]
            T = len(ref_phones)
            for s in range(lat.num_states):
                t = lat.state_time[s]
                new = []
                for a in lat.arcs[s]:
                    g = a.graph_cost
                    if a.ilabel and 0 <= t < T:
                        hyp = tm.tid_to_phone(a.ilabel)
                        if hyp in sil or ref_phones[t] in sil:
                            err = o.max_silence_error
                        else:
                            err = 0.0 if hyp == ref_phones[t] else 1.0
                        g -= o.b * err
                    new.append(LatticeArc(a.ilabel, a.olabel, g,
                                          a.acoustic_cost, a.nextstate))
                lat.arcs[s] = new
            w[key] = lat
            n += 1
    log.info("boosted %d lattices", n)
    return 0


# ---------------------------------------------------------------------------
# posterior / vector tools (src/bin rows)
# ---------------------------------------------------------------------------

@tool("copy-post")
def copy_post_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.hmm.posterior import scale_post
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("copy-post [options] <post-rspecifier> <post-wspecifier>")

    class Opts:
        scale = 1.0

    o = Opts()
    po.register("scale", o, "scale")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "post") as w:
        for key, post in SequentialTableReader(args[0], "post"):
            w[key] = scale_post(post, o.scale)
    return 0


@tool("scale-post")
def scale_post_tool(argv: List[str]) -> int:
    """Scale posteriors by per-utterance scalars or a global scale
    (src/bin/scale-post.cc)."""
    from old_kaldi_git_tpu.hmm.posterior import scale_post
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "scale-post <post-rspecifier> <scale-rspecifier|scale> "
        "<post-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    try:
        global_scale = float(args[1])
        scales = None
    except ValueError:
        global_scale = 1.0
        scales = RandomAccessTableReader(args[1], "flt")
    with TableWriter(args[2], "post") as w:
        for key, post in SequentialTableReader(args[0], "post"):
            if scales is not None:
                if key not in scales:
                    log.warning("no scale for %s", key)
                    continue
                w[key] = scale_post(post, float(scales[key]))
            else:
                w[key] = scale_post(post, global_scale)
    return 0


@tool("sum-post")
def sum_post_tool(argv: List[str]) -> int:
    """Sum two posterior archives frame-by-frame (src/bin/sum-post.cc)."""
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "sum-post [options] <post1-rspecifier> <post2-rspecifier> "
        "<post-wspecifier>"
    )

    class Opts:
        scale1 = 1.0
        scale2 = 1.0

    o = Opts()
    po.register("scale1", o, "scale1")
    po.register("scale2", o, "scale2")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    r2 = RandomAccessTableReader(args[1], "post")
    with TableWriter(args[2], "post") as w:
        for key, p1 in SequentialTableReader(args[0], "post"):
            if key not in r2:
                log.warning("no second posterior for %s", key)
                continue
            p2 = r2[key]
            if len(p1) != len(p2):
                log.warning("length mismatch for %s", key)
                continue
            out = []
            for f1, f2 in zip(p1, p2):
                d: Dict[int, float] = {}
                for i, v in f1:
                    d[i] = d.get(i, 0.0) + o.scale1 * v
                for i, v in f2:
                    d[i] = d.get(i, 0.0) + o.scale2 * v
                out.append(sorted(d.items()))
            w[key] = out
    return 0


@tool("vector-scale")
def vector_scale_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("vector-scale [options] <vec-rspecifier> <vec-wspecifier>")

    class Opts:
        scale = 1.0

    o = Opts()
    po.register("scale", o, "scale")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "vec") as w:
        for key, v in SequentialTableReader(args[0], "vec"):
            w[key] = np.asarray(v) * o.scale
    return 0


@tool("vector-sum")
def vector_sum_tool(argv: List[str]) -> int:
    """Sum vectors across archives per key, or all vectors of one archive
    into a single file with --sum-all (src/bin/vector-sum.cc)."""
    from old_kaldi_git_tpu.utils.io_funcs import BINARY_HEADER, write_vector
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "vector-sum <vec-rspecifier> [<vec-rspecifier2> ...] <vec-wspecifier>\n"
        "  or: vector-sum --sum-all <vec-rspecifier> <vec-file>"
    )

    class Opts:
        sum_all = False

    o = Opts()
    po.register("sum-all", o, "sum_all")
    args = po.parse(argv)
    if len(args) < 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    if o.sum_all:
        tot = None
        for _key, v in SequentialTableReader(args[0], "vec"):
            tot = np.asarray(v, np.float64) if tot is None else tot + v
        if tot is None:
            log.error("vector-sum --sum-all: empty input archive")
            return 1
        with open(args[1], "wb") as f:
            f.write(BINARY_HEADER)
            write_vector(f, np.asarray(tot, np.float32))
        return 0
    readers = [RandomAccessTableReader(a, "vec") for a in args[1:-1]]
    with TableWriter(args[-1], "vec") as w:
        for key, v in SequentialTableReader(args[0], "vec"):
            acc = np.asarray(v, np.float64)
            ok = True
            for r in readers:
                if key not in r:
                    log.warning("missing %s in an input archive", key)
                    ok = False
                    break
                acc = acc + r[key]
            if ok:
                w[key] = acc.astype(np.float32)
    return 0


# ---------------------------------------------------------------------------
# feature info tools (src/featbin rows)
# ---------------------------------------------------------------------------

@tool("feat-to-dim")
def feat_to_dim_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions("feat-to-dim <feats-rspecifier> <dim-wspecifier|->")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    it = SequentialTableReader(args[0], "mat")
    if args[1] == "-":
        for _key, f in it:
            print(f.shape[1])
            return 0
        return 1
    from old_kaldi_git_tpu.utils.table import TableWriter

    with TableWriter(args[1], "text") as w:
        for key, f in it:
            w[key] = str(f.shape[1])
    return 0


@tool("feat-to-len")
def feat_to_len_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("feat-to-len <feats-rspecifier> <len-wspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "text") as w:
        for key, f in SequentialTableReader(args[0], "mat"):
            w[key] = str(f.shape[0])
    return 0


@tool("wav-to-duration")
def wav_to_duration_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("wav-to-duration <wav-rspecifier> <dur-wspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "text") as w:
        for key, wav in SequentialTableReader(args[0], "wav"):
            w[key] = f"{wav.data.shape[1] / wav.samp_freq:.5g}"
    return 0


# ---------------------------------------------------------------------------
# fstbin extras
# ---------------------------------------------------------------------------

@tool("fsttablecompose")
def fsttablecompose_tool(argv: List[str]) -> int:
    """Alias of fstcompose (the reference's table-matcher optimization is a
    CPU-side detail; our compose sorts + hashes arcs already)."""
    from old_kaldi_git_tpu.fst.algorithms import compose

    po = ParseOptions("fsttablecompose <fst1> <fst2> <out-fst>")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    return _write_fst(compose(_read_fst(args[0]), _read_fst(args[1])), args[2])


@tool("fstisstochastic")
def fstisstochastic_tool(argv: List[str]) -> int:
    """Check arc-probability stochasticity in the log semiring; prints the
    (min, max) deviation like the reference (src/fstbin/fstisstochastic.cc);
    exit 0 iff within delta."""
    import math

    po = ParseOptions("fstisstochastic [options] <fst>")

    class Opts:
        delta = 0.01

    o = Opts()
    po.register("delta", o, "delta")
    args = po.parse(argv)
    if len(args) != 1:
        print(po.print_usage(), file=sys.stderr)
        return 1
    fst = _read_fst(args[0])
    lo = hi = 0.0
    for s in fst.states():
        tot = [math.exp(-a.weight) for a in fst.arcs[s]]
        if fst.is_final(s):
            tot.append(math.exp(-fst.finals[s]))
        if not tot:
            continue
        d = -math.log(sum(tot))
        lo = min(lo, d)
        hi = max(hi, d)
    print(f"{lo:.6g} {hi:.6g}")
    return 0 if (hi - lo) <= o.delta and abs(lo) <= o.delta else 1


@tool("fstaddsubsequentialloop")
def fstaddsubsequentialloop_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.context import add_subsequential_loop

    po = ParseOptions("fstaddsubsequentialloop <subseq-symbol> <in-fst> <out-fst>")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    return _write_fst(
        add_subsequential_loop(_read_fst(args[1]), int(args[0])), args[2]
    )


@tool("fstequivalent")
def fstequivalent_tool(argv: List[str]) -> int:
    """Random-path equivalence test between two FSTs (the reference uses
    fst::RandEquivalent in tests); exit 0 iff equivalent."""
    po = ParseOptions("fstequivalent [options] <fst1> <fst2>")

    class Opts:
        max_len = 8
        delta = 0.01

    o = Opts()
    po.register("max-len", o, "max_len")
    po.register("delta", o, "delta")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    from old_kaldi_git_tpu.fst.algorithms import fst_equivalent

    ok = fst_equivalent(
        _read_fst(args[0]), _read_fst(args[1]), max_len=o.max_len,
        tol=o.delta,
    )
    print("equivalent" if ok else "NOT equivalent")
    return 0 if ok else 1


# ---------------------------------------------------------------------------
# lmbin / gmmbin extras
# ---------------------------------------------------------------------------

@tool("arpa-to-const-arpa")
def arpa_to_const_arpa_tool(argv: List[str]) -> int:
    """Pre-parse an ARPA LM into the fast-loading const-arpa binary
    (src/lmbin/arpa-to-const-arpa.cc role)."""
    from old_kaldi_git_tpu.lm.arpa import parse_arpa, write_const_arpa

    po = ParseOptions("arpa-to-const-arpa <arpa-file> <const-arpa-file>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with open(args[0]) as f:
        lm = parse_arpa(f.read())
    write_const_arpa(lm, args[1])
    return 0


@tool("gmm-copy")
def gmm_copy_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel

    po = ParseOptions("gmm-copy <model-in> <model-out>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    AmGmmModel.load(args[0]).save(args[1])
    return 0


@tool("gmm-decode-faster")
def gmm_decode_faster_tool(argv: List[str]) -> int:
    """Decode to best path only — words + alignment, no lattice
    (src/gmmbin/gmm-decode-faster.cc)."""
    _jnp()  # decode on the host platform regardless of JAX_PLATFORMS
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "gmm-decode-faster [options] <model> <hclg-fst> <feats-rspecifier> "
        "<words-wspecifier> [<ali-wspecifier>]"
    )

    class Opts:
        beam = 16.0
        max_active = 7000
        acoustic_scale = 0.1
        word_symbol_table = ""

    o = Opts()
    po.register("beam", o, "beam")
    po.register("max-active", o, "max_active")
    po.register("acoustic-scale", o, "acoustic_scale")
    po.register("word-symbol-table", o, "word_symbol_table")
    args = po.parse(argv)
    if len(args) not in (4, 5):
        print(po.print_usage(), file=sys.stderr)
        return 1
    model = AmGmmModel.load(args[0])
    with open(args[1], "rb") as f:
        hclg = VectorFst.read(f)
    csr = fst_to_csr(hclg, model.tm.tid_to_pdf_array())
    feats = dict(SequentialTableReader(args[2], "mat"))
    if not feats:
        log.warning("no features")
        return 1
    keys, padded, nf = pad_feature_batch(feats)
    B, T, D = padded.shape
    loglikes = model.am.loglikes_numpy(padded.reshape(-1, D)).reshape(B, T, -1)
    results = decode_batch(
        csr, loglikes, nf,
        ViterbiOptions(beam=o.beam, max_active=o.max_active,
                       acoustic_scale=o.acoustic_scale),
    )
    words_tab = (
        SymbolTable.read(o.word_symbol_table) if o.word_symbol_table else None
    )
    awriter = TableWriter(args[4], "ivec") if len(args) == 5 else None
    n = 0
    with TableWriter(args[3], "text") as w:
        for key, res in zip(keys, results):
            if res is None:
                log.warning("decode failed for %s", key)
                continue
            w[key] = " ".join(
                words_tab[x] if words_tab else str(x) for x in res.words
            )
            if awriter is not None:
                awriter[key] = np.asarray(res.alignment, np.int32)
            n += 1
    if awriter is not None:
        awriter.close()
    log.info("decoded %d/%d utterances", n, len(keys))
    return 0


@tool("gmm-acc-stats")
def gmm_acc_stats_tool(argv: List[str]) -> int:
    """Accumulate GMM + transition stats from (tid) POSTERIORS — soft
    counts, the MMI/MPE and silence-weighted path
    (src/gmmbin/gmm-acc-stats.cc; gmm-acc-stats-ali is the hard variant)."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.gmm.mle import AccumAmDiagGmm, write_accs
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
    )

    po = ParseOptions(
        "gmm-acc-stats <model> <feats-rspecifier> <post-rspecifier> "
        "<stats-out>"
    )
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    model = AmGmmModel.load(args[0])
    posts = RandomAccessTableReader(args[2], "post")
    accs = AccumAmDiagGmm(model.am)
    trans_stats = np.zeros(model.tm.num_tids + 1)
    n = frames = 0
    for k, feats in SequentialTableReader(args[1], "mat"):
        if k not in posts:
            continue
        post = posts[k]
        feats = np.asarray(feats)
        if len(post) != len(feats):
            log.warning("%s: post length %d != frames %d, skipping",
                        k, len(post), len(feats))
            continue
        # group entries by pdf so each accumulate call is vectorized
        by_pdf: Dict[int, Tuple[list, list]] = {}
        for t, frame in enumerate(post):
            for tid, wgt in frame:
                pdf = model.tm.tid_to_pdf(int(tid))
                by_pdf.setdefault(pdf, ([], []))
                by_pdf[pdf][0].append(t)
                by_pdf[pdf][1].append(wgt)
                trans_stats[int(tid)] += wgt
        for pdf, (ts, ws) in by_pdf.items():
            accs.accumulate(
                model.am, feats[ts], [pdf] * len(ts),
                weights=np.asarray(ws, np.float64),
            )
        n += 1
        frames += len(post)
    with open(args[3], "wb") as f:
        write_accs(f, accs, trans_stats)
    log.info("gmm-acc-stats: %d utts, %d frames", n, frames)
    return 0


@tool("fstcomposecontext")
def fstcomposecontext_tool(argv: List[str]) -> int:
    """Compose an LG with the context transducer C on demand, emitting the
    ilabel-info table (src/fstbin/fstcomposecontext.cc / ComposeContext)."""
    from old_kaldi_git_tpu.fst.context import compose_context

    po = ParseOptions(
        "fstcomposecontext [options] <ilabels-out> <in-fst|LG> <out-fst|CLG>"
    )

    class Opts:
        context_size = 3
        central_position = 1
        read_disambig_syms = ""
        subseq_symbol = 0  # 0 → max label + 1

    o = Opts()
    po.register("context-size", o, "context_size")
    po.register("central-position", o, "central_position")
    po.register("read-disambig-syms", o, "read_disambig_syms")
    po.register("subseq-symbol", o, "subseq_symbol")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    lg = _read_fst(args[1])
    disambig = []
    if o.read_disambig_syms:
        with open(o.read_disambig_syms) as f:
            disambig = [int(x) for x in f.read().split()]
    subseq = o.subseq_symbol
    if not subseq:
        mx = 0
        for s in lg.states():
            for a in lg.arcs[s]:
                mx = max(mx, a.ilabel)
        subseq = mx + 1
    clg, ilabel_info = compose_context(
        lg, o.context_size, o.central_position, disambig, subseq
    )
    with open(args[0], "w") as f:
        for info in ilabel_info:
            f.write(" ".join(str(x) for x in info) + "\n")
    return _write_fst(clg, args[2])


@tool("lattice-interp")
def lattice_interp_tool(argv: List[str]) -> int:
    """Interpolate scores of paired lattices: alpha * lat1 + (1-alpha) *
    lat2-word-costs on the common word sequences
    (reference latbin/lattice-interp.cc)."""
    from old_kaldi_git_tpu.lat.lattice import lattice_interp
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "lattice-interp [options] <lat1-rspecifier> <lat2-rspecifier> "
        "<lat-wspecifier>"
    )

    class Opts:
        alpha = 0.5
        lm_scale2 = 1.0
        acoustic_scale2 = 0.1

    o = Opts()
    po.register("alpha", o, "alpha")
    po.register("lm-scale2", o, "lm_scale2")
    po.register("acoustic-scale2", o, "acoustic_scale2")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    lat2s = RandomAccessTableReader(args[1], "lat")
    n_done = n_empty = n_missing = 0
    with TableWriter(args[2], "lat") as w:
        for key, lat1 in SequentialTableReader(args[0], "lat"):
            if key not in lat2s:
                n_missing += 1
                continue
            out = lattice_interp(
                lat1, lat2s[key], alpha=o.alpha, lm_scale2=o.lm_scale2,
                ac_scale2=o.acoustic_scale2)
            if out is None:
                n_empty += 1
                continue
            w[key] = out
            n_done += 1
    log.info("lattice-interp: %d done, %d empty intersections, %d missing",
             n_done, n_empty, n_missing)
    return 0 if n_done else 1


@tool("lattice-align-words")
def lattice_align_words_tool(argv: List[str]) -> int:
    """Word time alignment of the best path via word-boundary phone marks
    (reference latbin/lattice-align-words.cc; input = lang
    word_boundary.int); writes 'word start_frame num_frames' triples like
    lattice-align-words-lexicon."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.lat.ctm import (
        align_words_boundary,
        read_word_boundary,
    )
    from old_kaldi_git_tpu.lat.lattice import lattice_best_path
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-align-words [options] <word-boundary-int> <model> "
        "<lat-rspecifier> <align-wspecifier>"
    )

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.1

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    boundary = read_word_boundary(args[0])
    tm = AmGmmModel.load(args[1]).tm
    n_done = n_err = 0
    with TableWriter(args[3], "text") as w:
        for key, lat in SequentialTableReader(args[2], "lat"):
            words, tids, _ = lattice_best_path(lat, o.lm_scale,
                                               o.acoustic_scale)
            try:
                ali = align_words_boundary(tm, boundary, words, tids)
            except Exception as e:  # noqa: BLE001 — per-utt robustness
                log.warning("alignment failed for %s: %s", key, e)
                n_err += 1
                continue
            w[key] = " ; ".join(f"{w_} {s} {n}" for w_, s, n in ali)
            n_done += 1
    log.info("aligned %d lattices (%d failed)", n_done, n_err)
    return 0 if n_done or not n_err else 1


@tool("phone-align-lattice")
def phone_align_lattice_tool(argv: List[str]) -> int:
    """Phone time alignment of the best path
    (reference latbin/phone-align-lattice.cc role); writes per-utterance
    'phone start_frame num_frames' triples."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.hmm.hmm_utils import split_to_phones
    from old_kaldi_git_tpu.lat.lattice import lattice_best_path
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "phone-align-lattice [options] <model> <lat-rspecifier> "
        "<align-wspecifier>"
    )

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.1

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    tm = AmGmmModel.load(args[0]).tm
    n = 0
    with TableWriter(args[2], "text") as w:
        for key, lat in SequentialTableReader(args[1], "lat"):
            _words, tids, _ = lattice_best_path(lat, o.lm_scale,
                                                o.acoustic_scale)
            segs = []
            t = 0
            for seg in split_to_phones(tm, list(tids)):
                segs.append((tm.tid_to_phone(seg[0]), t, len(seg)))
                t += len(seg)
            w[key] = " ; ".join(f"{p} {s} {nf}" for p, s, nf in segs)
            n += 1
    log.info("phone-aligned %d lattices", n)
    return 0 if n else 1


@tool("lattice-to-mpe-post")
def lattice_to_mpe_post_tool(argv: List[str], _default_criterion="mpfe") -> int:
    """Signed MPE ('mpfe') / sMBR tid posteriors from lattices + numerator
    alignments (src/latbin/lattice-to-mpe-post.cc via
    LatticeForwardBackwardMpeVariants); positive weight on
    better-than-average-accuracy arcs, negative on worse."""
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.lat.discriminative import (
        forward_backward_mpe_variants,
    )
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "lattice-to-mpe-post [options] <model> <num-ali-rspecifier> "
        "<lats-rspecifier> <post-wspecifier>"
    )

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.1
        criterion = _default_criterion
        silence_phones = ""

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    po.register("criterion", o, "criterion")
    po.register("silence-phones", o, "silence_phones")
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    tm = AmGmmModel.load(args[0]).tm
    sil = [int(p) for p in o.silence_phones.split(":") if p]
    alis = RandomAccessTableReader(args[1], "ivec")
    tot_acc = tot_frames = 0.0
    n = 0
    with TableWriter(args[3], "post") as w:
        for key, lat in SequentialTableReader(args[2], "lat"):
            if key not in alis:
                log.warning("no numerator alignment for %s", key)
                continue
            post, acc = forward_backward_mpe_variants(
                lat, tm, alis[key], criterion=o.criterion,
                silence_phones=sil, lm_scale=o.lm_scale,
                ac_scale=o.acoustic_scale,
            )
            w[key] = post
            tot_acc += acc
            tot_frames += len(post)
            n += 1
    if tot_frames:
        log.info("lattice-to-%s-post: avg accuracy %.4f over %d utts",
                 o.criterion, tot_acc / tot_frames, n)
    return 0


@tool("lattice-to-smbr-post")
def lattice_to_smbr_post_tool(argv: List[str]) -> int:
    """sMBR (pdf-accuracy) signed posteriors
    (src/latbin/lattice-to-smbr-post.cc)."""
    return lattice_to_mpe_post_tool(argv, _default_criterion="smbr")


@tool("make-grammar-fst")
def make_grammar_fst_tool(argv: List[str]) -> int:
    """Expand nonterminal arcs of a top-level FST with sub-FSTs
    (the build-time role of reference src/decoder/grammar-fst.{h,cc} /
    make-grammar-fst; expansion is static so the TPU decode graph stays
    dense — see fst/algorithms.py replace_fst).

    usage: make-grammar-fst <top-fst> <label1> <sub-fst1> \
               [<label2> <sub-fst2> ...] <out-fst>
    Labels are word ids, or symbols when --word-symbol-table is given."""
    from old_kaldi_git_tpu.fst.algorithms import replace_fst
    from old_kaldi_git_tpu.fst.symbols import SymbolTable

    po = ParseOptions(
        "make-grammar-fst [options] <top-fst> <label1> <sub-fst1> "
        "[<label2> <sub-fst2> ...] <out-fst>"
    )

    class Opts:
        word_symbol_table = ""

    o = Opts()
    po.register("word-symbol-table", o, "word_symbol_table")
    args = po.parse(argv)
    if len(args) < 4 or len(args) % 2 != 0:
        print(po.print_usage(), file=sys.stderr)
        return 1
    syms = (SymbolTable.read(o.word_symbol_table)
            if o.word_symbol_table else None)
    top = _read_fst(args[0])
    repl = {}
    pairs = args[1:-1]
    for lab, path in zip(pairs[0::2], pairs[1::2]):
        label = syms[lab] if (syms and not lab.isdigit()) else int(lab)
        repl[label] = _read_fst(path)
    out = replace_fst(top, repl)
    log.info("make-grammar-fst: %d nonterminals, %d states, %d arcs",
             len(repl), out.num_states, out.num_arcs)
    return _write_fst(out, args[-1])


@tool("lattice-confidence")
def lattice_confidence_tool(argv: List[str]) -> int:
    """Per-utterance confidence = total-cost gap between the best and
    second-best word sequences (reference src/lat/confidence.{h,cc}
    ComputeLatticeConfidence / latbin/lattice-confidence.cc); clipped to
    [0, max] like the reference, with max for single-path lattices."""
    from old_kaldi_git_tpu.lat.lattice import lattice_nbest_paths
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-confidence [options] <lat-rspecifier> <conf-wspecifier>")

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.1
        max_confidence = 1e10

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    po.register("max-confidence", o, "max_confidence")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    n = 0
    with TableWriter(args[1], "flt") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            # confidence is over DISTINCT word sequences: raw lattices
            # often have many same-word paths (alternative alignments), so
            # pull a deep N-best and dedup on the word tuple
            paths = lattice_nbest_paths(lat, 64, o.lm_scale,
                                        o.acoustic_scale)
            seen = []
            seen_words = set()
            for arcs, (fg, fa) in paths:
                words = tuple(a.olabel for a in arcs if a.olabel)
                if words in seen_words:
                    continue
                seen_words.add(words)
                cost = (sum(lat.combined(a, o.lm_scale, o.acoustic_scale)
                            for a in arcs)
                        + o.lm_scale * fg + o.acoustic_scale * fa)
                seen.append((words, cost))
                if len(seen) == 2:
                    break
            if not seen:
                continue
            conf = (o.max_confidence if len(seen) < 2
                    else min(max(seen[1][1] - seen[0][1], 0.0),
                             o.max_confidence))
            w[key] = conf
            n += 1
    log.info("lattice-confidence: %d utterances", n)
    return 0


@tool("rnnlm-train")
def rnnlm_train_tool(argv: List[str]) -> int:
    """Train the LSTM word LM on a transcript table (the reference's
    mikolov-rnnlm / kaldi-rnnlm training role, TPU-batched)."""
    _jnp()
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.lm.rnnlm import (
        RnnLmOptions,
        save_rnnlm,
        train_rnnlm,
    )
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions(
        "rnnlm-train [options] <text-rspecifier> <word-symbol-table> "
        "<rnnlm-out>"
    )
    o = RnnLmOptions()
    po.register("embed-dim", o, "embed_dim")
    po.register("cell-dim", o, "cell_dim")
    po.register("recurrent-dim", o, "recurrent_dim")
    po.register("num-epochs", o, "num_epochs")
    po.register("learning-rate", o, "learning_rate")
    po.register("srand", o, "seed")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    syms = SymbolTable.read(args[1])
    num_words = max(syms.ids())
    seqs = []
    for _, line in SequentialTableReader(args[0], "text"):
        ids = [syms[w] for w in line.split() if w in syms]
        if ids:
            seqs.append(ids)
    lm = train_rnnlm(seqs, num_words, o)
    save_rnnlm(lm, args[2])
    log.info("rnnlm-train: %d sentences, vocab %d", len(seqs), num_words)
    return 0


@tool("lattice-lmrescore-rnnlm")
def lattice_lmrescore_rnnlm_tool(argv: List[str]) -> int:
    """RNNLM N-best lattice rescoring (the reference's
    rnnlm/lmrescore_nbest path: lattice-to-nbest → score → re-rank,
    batched through one forward pass per lattice).  Each of the N best
    paths' graph cost is interpolated with the RNNLM negative log-prob at
    --rnnlm-scale; output is the re-ranked N-best as lattices."""
    _jnp()
    from old_kaldi_git_tpu.lat.lattice import (
        LatticeArc,
        lattice_nbest_paths,
        lattice_union,
        linear_lattice_from_path,
    )
    from old_kaldi_git_tpu.lm.rnnlm import load_rnnlm
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-lmrescore-rnnlm [options] <rnnlm> <lat-rspecifier> "
        "<lat-wspecifier>"
    )

    class Opts:
        rnnlm_scale = 0.5
        n = 10
        lm_scale = 1.0
        acoustic_scale = 0.1

    o = Opts()
    po.register("rnnlm-scale", o, "rnnlm_scale")
    po.register("n", o, "n")
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    rnnlm = load_rnnlm(args[0])
    n_done = 0
    with TableWriter(args[2], "lat") as w:
        for key, lat in SequentialTableReader(args[1], "lat"):
            paths = lattice_nbest_paths(lat, o.n, o.lm_scale,
                                        o.acoustic_scale)
            if not paths:
                continue
            word_seqs = [[a.olabel for a in arcs if a.olabel]
                         for arcs, _ in paths]
            rnn_neglogs = -rnnlm.logprobs_batch(word_seqs)
            linear = []
            for (arcs, fin), rnn in zip(paths, rnn_neglogs):
                old_g = sum(a.graph_cost for a in arcs) + fin[0]
                new_g = ((1.0 - o.rnnlm_scale) * old_g
                         + o.rnnlm_scale * float(rnn))
                # put the interpolated graph cost on the first arc; the
                # final keeps only its acoustic part
                new_arcs = [
                    LatticeArc(a.ilabel, a.olabel,
                               new_g if i == 0 else 0.0,
                               a.acoustic_cost, a.nextstate)
                    for i, a in enumerate(arcs)
                ]
                linear.append(
                    linear_lattice_from_path(new_arcs, (0.0, fin[1])))
            w[key] = lattice_union(linear)
            n_done += 1
    log.info("lattice-lmrescore-rnnlm: %d lattices", n_done)
    return 0


@tool("lattice-lmrescore-pruned")
def lattice_lmrescore_pruned_tool(argv: List[str]) -> int:
    """Beam-pruned LM rescoring of compact lattices (reference
    lat/compose-lattice-pruned.{h,cc} via latbin lattice-lmrescore-pruned):
    only the competitive region of the (lattice x LM-history) product is
    expanded — the big-LM path where exact composition blows up."""
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.lat.rescore import compose_lattice_pruned
    from old_kaldi_git_tpu.lm.arpa import load_lm
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-lmrescore-pruned [options] --words=words.txt "
        "<clat-rspecifier> <const-arpa-or-arpa-file> <clat-wspecifier>"
    )

    class Opts:
        lm_scale = 1.0
        lattice_beam = 6.0
        max_arcs = 200000
        words = ""

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("lattice-beam", o, "lattice_beam")
    po.register("max-arcs", o, "max_arcs")
    po.register("words", o, "words")
    args = po.parse(argv)
    if len(args) != 3 or not o.words:
        print(po.print_usage(), file=sys.stderr)
        return 1
    lm = load_lm(args[1])
    words = SymbolTable.read(o.words)
    with TableWriter(args[2], "clat") as w:
        for key, clat in SequentialTableReader(args[0], "clat"):
            w[key] = compose_lattice_pruned(
                clat, words, lm, new_scale=o.lm_scale,
                lattice_beam=o.lattice_beam, max_arcs=o.max_arcs,
            )
    return 0
