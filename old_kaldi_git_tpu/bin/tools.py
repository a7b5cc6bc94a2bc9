"""Implementations of the CLI tools (see bin/__init__ and bin/__main__).

Each tool function takes argv (excluding the tool name) and returns an exit
code.  Reference parity: featbin/compute-{mfcc,fbank}-feats,
compute-cmvn-stats, apply-cmvn, add-deltas, splice-feats, copy-feats,
bin/compute-wer, bin/ali-to-phones, gmm-info, lmbin/arpa2fst,
fstbin-style fstinfo/fstprint on the framework FST format.
"""

from __future__ import annotations

import sys
from typing import Callable, Dict, List

import numpy as np

from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import ParseOptions, options_dataclass

log = get_logger("bin")

TOOLS: Dict[str, Callable[[List[str]], int]] = {}


def tool(name: str):
    def reg(fn):
        TOOLS[name] = fn
        return fn

    return reg


def _jnp():
    import jax

    jax.config.update("jax_platforms", "cpu")  # CLI tools are small/offline
    import jax.numpy as jnp

    return jnp


@tool("compute-mfcc-feats")
def compute_mfcc_feats(argv: List[str]) -> int:
    from old_kaldi_git_tpu.feat.compute import Mfcc, MfccOptions
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    opts = MfccOptions()
    po = ParseOptions(
        "compute-mfcc-feats [options] <wav-rspecifier> <feats-wspecifier>"
    )
    po.register_dataclass(opts.frame_opts)
    po.register_dataclass(opts.mel_opts, prefix="mel")
    po.register("num-ceps", opts, "num_ceps")
    po.register("use-energy", opts, "use_energy")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    mfcc = Mfcc(opts)
    n = 0
    with TableWriter(args[1], "mat") as w:
        for key, wave in SequentialTableReader(args[0], "wav"):
            if wave.samp_freq != opts.frame_opts.samp_freq:
                log.warning("%s: samp_freq %.0f != config %.0f, skipping",
                            key, wave.samp_freq, opts.frame_opts.samp_freq)
                continue
            w[key] = np.asarray(mfcc(jnp.asarray(wave.data[0])))
            n += 1
    log.info("computed MFCC for %d utterances", n)
    return 0


@tool("compute-fbank-feats")
def compute_fbank_feats(argv: List[str]) -> int:
    from old_kaldi_git_tpu.feat.compute import Fbank, FbankOptions
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    opts = FbankOptions()
    po = ParseOptions(
        "compute-fbank-feats [options] <wav-rspecifier> <feats-wspecifier>"
    )
    po.register_dataclass(opts.frame_opts)
    po.register_dataclass(opts.mel_opts, prefix="mel")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    fbank = Fbank(opts)
    with TableWriter(args[1], "mat") as w:
        for key, wave in SequentialTableReader(args[0], "wav"):
            w[key] = np.asarray(fbank(jnp.asarray(wave.data[0])))
    return 0


@tool("compute-cmvn-stats")
def compute_cmvn_stats_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.feat.cmvn import acc_cmvn_stats
    from old_kaldi_git_tpu.utils.data_dir import _read_map
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "compute-cmvn-stats [--spk2utt=file] <feats-rspecifier> <stats-wspecifier>"
    )

    class Opts:
        spk2utt = ""

    o = Opts()
    po.register("spk2utt", o, "spk2utt")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    feats = dict(SequentialTableReader(args[0], "mat"))
    with TableWriter(args[1], "mat") as w:
        if o.spk2utt:
            for spk, utts in _read_map(o.spk2utt).items():
                stats = None
                for u in utts.split():
                    if u in feats:
                        s = acc_cmvn_stats(feats[u])
                        stats = s if stats is None else stats + s
                if stats is not None:
                    w[spk] = stats
        else:
            for key, f in feats.items():
                w[key] = acc_cmvn_stats(f)
    return 0


@tool("apply-cmvn")
def apply_cmvn_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.feat.cmvn import cmvn_shift_scale
    from old_kaldi_git_tpu.utils.data_dir import _read_map
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "apply-cmvn [--norm-vars=bool] [--utt2spk=file] "
        "<cmvn-rspecifier> <feats-rspecifier> <feats-wspecifier>"
    )

    class Opts:
        norm_vars = False
        utt2spk = ""

    o = Opts()
    po.register("norm-vars", o, "norm_vars")
    po.register("utt2spk", o, "utt2spk")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    stats = RandomAccessTableReader(args[0], "mat")
    utt2spk = _read_map(o.utt2spk) if o.utt2spk else {}
    with TableWriter(args[2], "mat") as w:
        for key, f in SequentialTableReader(args[1], "mat"):
            skey = utt2spk.get(key, key)
            if skey not in stats:
                log.warning("no cmvn stats for %s", skey)
                continue
            shift, scale = cmvn_shift_scale(stats[skey], o.norm_vars)
            w[key] = (f * scale + shift).astype(np.float32)
    return 0


@tool("add-deltas")
def add_deltas_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.feat.functions import DeltaFeaturesOptions, compute_deltas
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    opts = DeltaFeaturesOptions()
    po = ParseOptions("add-deltas [options] <feats-rspecifier> <feats-wspecifier>")
    po.register_dataclass(opts)
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "mat") as w:
        for key, f in SequentialTableReader(args[0], "mat"):
            w[key] = np.asarray(compute_deltas(jnp.asarray(f[None]), opts)[0])
    return 0


@tool("splice-feats")
def splice_feats_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.recipes.triphone import splice_numpy
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("splice-feats [options] <feats-rspecifier> <feats-wspecifier>")

    class Opts:
        left_context = 4
        right_context = 4

    o = Opts()
    po.register("left-context", o, "left_context")
    po.register("right-context", o, "right_context")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "mat") as w:
        for key, f in SequentialTableReader(args[0], "mat"):
            w[key] = splice_numpy(f, o.left_context, o.right_context)
    return 0


@tool("copy-feats")
def copy_feats_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("copy-feats <feats-rspecifier> <feats-wspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "mat") as w:
        for key, f in SequentialTableReader(args[0], "mat"):
            w[key] = f
    return 0


@tool("compute-wer")
def compute_wer_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.edit_distance import compute_wer
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions("compute-wer <ref-rspecifier> <hyp-rspecifier>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    ref = {k: v.split() for k, v in SequentialTableReader(args[0], "text")}
    hyp = {k: v.split() for k, v in SequentialTableReader(args[1], "text")}
    stats = compute_wer(ref, hyp)
    print(stats.report())
    print(f"%SER {100.0 * stats.err_sent / max(stats.num_sent, 1):.2f} "
          f"[ {stats.err_sent} / {stats.num_sent} ]")
    return 0


@tool("ali-to-phones")
def ali_to_phones_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.hmm.hmm_utils import alignment_to_phones
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("ali-to-phones <model> <ali-rspecifier> <phones-wspecifier>")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    model = AmGmmModel.load(args[0])
    with TableWriter(args[2], "ivec") as w:
        for key, ali in SequentialTableReader(args[1], "ivec"):
            w[key] = np.asarray(alignment_to_phones(model.tm, ali), np.int32)
    return 0


@tool("gmm-info")
def gmm_info_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel

    po = ParseOptions("gmm-info <model>")
    args = po.parse(argv)
    if len(args) != 1:
        print(po.print_usage(), file=sys.stderr)
        return 1
    m = AmGmmModel.load(args[0])
    print(f"number of phones {len(m.tm.topo.phones)}")
    print(f"number of pdfs {m.am.num_pdfs}")
    print(f"number of transition-ids {m.tm.num_tids}")
    print(f"number of transition-states {len(m.tm.tuples)}")
    print(f"number of gaussians {m.am.num_gauss}")
    print(f"feature dimension {m.am.dim}")
    return 0


@tool("arpa2fst")
def arpa2fst_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.lm.arpa import arpa_to_fst, parse_arpa

    po = ParseOptions(
        "arpa2fst --words=words.txt <arpa-file> <fst-out>"
    )

    class Opts:
        words = ""

    o = Opts()
    po.register("words", o, "words")
    args = po.parse(argv)
    if len(args) != 2 or not o.words:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with open(args[0]) as f:
        lm = parse_arpa(f.read())
    words = SymbolTable.read(o.words)
    g = arpa_to_fst(lm, words)
    with open(args[1], "wb") as f:
        g.write(f)
    return 0


@tool("fstinfo")
def fstinfo_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst

    po = ParseOptions("fstinfo <fst-file>")
    args = po.parse(argv)
    if len(args) != 1:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with open(args[0], "rb") as f:
        fst = VectorFst.read(f)
    n_final = sum(1 for s in fst.states() if fst.is_final(s))
    print(f"# of states  {fst.num_states}")
    print(f"# of arcs    {fst.num_arcs}")
    print(f"start state  {fst.start}")
    print(f"# of final states  {n_final}")
    return 0


@tool("fstprint")
def fstprint_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst

    po = ParseOptions("fstprint <fst-file>")
    args = po.parse(argv)
    if len(args) != 1:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with open(args[0], "rb") as f:
        fst = VectorFst.read(f)
    sys.stdout.write(fst.to_text())
    return 0


def main(argv: List[str]) -> int:
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m old_kaldi_git_tpu.bin <tool> [options] <args>",
              file=sys.stderr)
        print("tools:", file=sys.stderr)
        for name in sorted(TOOLS):
            print(f"  {name}", file=sys.stderr)
        return 0 if argv else 1
    name = argv[0]
    if name not in TOOLS:
        print(f"unknown tool {name!r}; run with --help for the list",
              file=sys.stderr)
        return 1
    try:
        return TOOLS[name](argv[1:])
    except SystemExit:
        raise
    except (KaldiError, ValueError, OSError) as e:
        print(f"ERROR ({name}): {e}", file=sys.stderr)
        return 1
