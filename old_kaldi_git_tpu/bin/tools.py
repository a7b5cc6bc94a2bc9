"""Implementations of the CLI tools (see bin/__init__ and bin/__main__).

Each tool function takes argv (excluding the tool name) and returns an exit
code.  Reference parity: featbin/compute-{mfcc,fbank}-feats,
compute-cmvn-stats, apply-cmvn, add-deltas, splice-feats, copy-feats,
bin/compute-wer, bin/ali-to-phones, gmm-info, lmbin/arpa2fst,
fstbin-style fstinfo/fstprint on the framework FST format.
"""

from __future__ import annotations

import math
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

    po = ParseOptions(
        "copy-feats [--compress=bool] <feats-rspecifier> <feats-wspecifier>"
    )

    class Opts:
        compress = False

    o = Opts()
    po.register("compress", o, "compress")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    holder = "cmat" if o.compress else "mat"
    with TableWriter(args[1], holder) as w:
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


# ---------------------------------------------------------------------------
# more feature tools
# ---------------------------------------------------------------------------

@tool("compute-spectrogram-feats")
def compute_spectrogram_feats(argv: List[str]) -> int:
    from old_kaldi_git_tpu.feat.compute import Spectrogram, SpectrogramOptions
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    opts = SpectrogramOptions()
    po = ParseOptions(
        "compute-spectrogram-feats [options] <wav-rspecifier> <feats-wspecifier>"
    )
    po.register_dataclass(opts.frame_opts)
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    comp = Spectrogram(opts)
    with TableWriter(args[1], "mat") as w:
        for key, wave in SequentialTableReader(args[0], "wav"):
            w[key] = np.asarray(comp(jnp.asarray(wave.data[0])))
    return 0


@tool("compute-plp-feats")
def compute_plp_feats(argv: List[str]) -> int:
    from old_kaldi_git_tpu.feat.compute import Plp, PlpOptions
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    opts = PlpOptions()
    po = ParseOptions(
        "compute-plp-feats [options] <wav-rspecifier> <feats-wspecifier>"
    )
    po.register_dataclass(opts.frame_opts)
    po.register_dataclass(opts.mel_opts, prefix="mel")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    comp = Plp(opts)
    with TableWriter(args[1], "mat") as w:
        for key, wave in SequentialTableReader(args[0], "wav"):
            w[key] = np.asarray(comp(jnp.asarray(wave.data[0])))
    return 0


@tool("compute-kaldi-pitch-feats")
def compute_kaldi_pitch_feats(argv: List[str]) -> int:
    from old_kaldi_git_tpu.feat.pitch import PitchOptions, compute_kaldi_pitch
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    opts = PitchOptions()
    po = ParseOptions(
        "compute-kaldi-pitch-feats [options] <wav-rspecifier> <feats-wspecifier>"
    )
    po.register_dataclass(opts)
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "mat") as w:
        for key, wave in SequentialTableReader(args[0], "wav"):
            w[key] = np.asarray(
                compute_kaldi_pitch(jnp.asarray(wave.data[0:1]), opts)[0]
            )
    return 0


@tool("process-kaldi-pitch-feats")
def process_kaldi_pitch_feats(argv: List[str]) -> int:
    from old_kaldi_git_tpu.feat.pitch import ProcessPitchOptions, process_pitch
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    opts = ProcessPitchOptions()
    po = ParseOptions(
        "process-kaldi-pitch-feats [options] <pitch-rspecifier> <feats-wspecifier>"
    )
    po.register_dataclass(opts)
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "mat") as w:
        for key, p in SequentialTableReader(args[0], "mat"):
            w[key] = np.asarray(process_pitch(jnp.asarray(p[None]), opts)[0])
    return 0


@tool("compute-vad")
def compute_vad_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.ivector.vad import VadOptions, compute_vad_energy
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    opts = VadOptions()
    po = ParseOptions("compute-vad [options] <feats-rspecifier> <vad-wspecifier>")
    po.register_dataclass(opts)
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "vec") as w:
        for key, f in SequentialTableReader(args[0], "mat"):
            w[key] = np.asarray(
                compute_vad_energy(jnp.asarray(f[None, :, 0]), opts)[0]
            )
    return 0


@tool("paste-feats")
def paste_feats_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "paste-feats <feats-rspecifier1> <feats-rspecifier2> [...] <wspecifier>"
    )
    args = po.parse(argv)
    if len(args) < 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    tables = [dict(SequentialTableReader(a, "mat")) for a in args[:-1]]
    with TableWriter(args[-1], "mat") as w:
        for key in tables[0]:
            if not all(key in t for t in tables):
                log.warning("paste-feats: %s missing in some inputs", key)
                continue
            T = min(t[key].shape[0] for t in tables)
            w[key] = np.concatenate([t[key][:T] for t in tables], axis=1)
    return 0


@tool("select-feats")
def select_feats_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        'select-feats <selection> <feats-rspecifier> <wspecifier>  '
        '(e.g. "0-12" or "0,2,4-6")'
    )
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    cols: List[int] = []
    for piece in args[0].split(","):
        if "-" in piece:
            a, b = piece.split("-")
            cols.extend(range(int(a), int(b) + 1))
        else:
            cols.append(int(piece))
    idx = np.asarray(cols)
    with TableWriter(args[2], "mat") as w:
        for key, f in SequentialTableReader(args[1], "mat"):
            w[key] = f[:, idx]
    return 0


@tool("subsample-feats")
def subsample_feats_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("subsample-feats --n=N <feats-rspecifier> <wspecifier>")

    class Opts:
        n = 1
        offset = 0

    o = Opts()
    po.register("n", o, "n")
    po.register("offset", o, "offset")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "mat") as w:
        for key, f in SequentialTableReader(args[0], "mat"):
            w[key] = f[o.offset :: o.n]
    return 0


@tool("extract-segments")
def extract_segments_tool(argv: List[str]) -> int:
    """segments file: <seg-id> <rec-id> <start-sec> <end-sec>"""
    from old_kaldi_git_tpu.utils.table import RandomAccessTableReader, TableWriter
    from old_kaldi_git_tpu.utils.wav import WaveData

    po = ParseOptions(
        "extract-segments <wav-rspecifier> <segments-file> <wav-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    wavs = RandomAccessTableReader(args[0], "wav")
    n = 0
    with TableWriter(args[2], "wav") as w:
        with open(args[1]) as f:
            for ln in f:
                parts = ln.split()
                if len(parts) != 4:
                    continue
                seg, rec, s, e = parts[0], parts[1], float(parts[2]), float(parts[3])
                if rec not in wavs:
                    log.warning("extract-segments: no wav for %s", rec)
                    continue
                wav = wavs[rec]
                sr = wav.samp_freq
                i0, i1 = int(s * sr), int(e * sr)
                if i1 <= i0 or i0 >= wav.data.shape[1]:
                    log.warning("extract-segments: bad range for %s", seg)
                    continue
                w[seg] = WaveData(samp_freq=sr, data=wav.data[:, i0:i1])
                n += 1
    log.info("extracted %d segments", n)
    return 0


# ---------------------------------------------------------------------------
# decode + lattice tools
# ---------------------------------------------------------------------------

@tool("gmm-latgen-faster")
def gmm_latgen_faster_tool(argv: List[str]) -> int:
    _jnp()  # decode on the host platform regardless of JAX_PLATFORMS
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.lat.lattice import lattice_from_decode
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "gmm-latgen-faster [options] <model> <hclg-fst> <feats-rspecifier> "
        "<lattice-wspecifier> [<words-wspecifier>]"
    )

    class Opts:
        beam = 16.0
        max_active = 7000
        acoustic_scale = 0.1
        lattice_beam = 10.0
        word_symbol_table = ""

    o = Opts()
    for name, attr in (("beam", "beam"), ("max-active", "max_active"),
                       ("acoustic-scale", "acoustic_scale"),
                       ("lattice-beam", "lattice_beam"),
                       ("word-symbol-table", "word_symbol_table")):
        po.register(name, o, attr)
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
    from old_kaldi_git_tpu.utils.batching import pad_feature_batch

    keys, padded, nf = pad_feature_batch(feats)
    B, T, D = padded.shape
    loglikes = model.am.loglikes_numpy(padded.reshape(-1, D)).reshape(B, T, -1)
    results = decode_batch(
        csr, loglikes, nf,
        ViterbiOptions(beam=o.beam, max_active=o.max_active,
                       acoustic_scale=o.acoustic_scale),
        want_lattice=True,
    )
    words_tab = (
        SymbolTable.read(o.word_symbol_table) if o.word_symbol_table else None
    )
    wwriter = TableWriter(args[4], "text") if len(args) == 5 else None
    n_done = 0
    with TableWriter(args[3], "lat") as lw:
        for i, (k, res) in enumerate(zip(keys, results)):
            if res is None:
                log.warning("decode failed for %s", k)
                continue
            lat = lattice_from_decode(
                csr, loglikes[i, : nf[i]], res.frame_states, res.frame_costs,
                o.acoustic_scale, o.lattice_beam,
            )
            if lat is not None:
                lw[k] = lat
            if wwriter is not None:
                if words_tab:
                    wwriter[k] = " ".join(words_tab[w] for w in res.words)
                else:
                    wwriter[k] = " ".join(str(w) for w in res.words)
            n_done += 1
    if wwriter is not None:
        wwriter.close()
    log.info("decoded %d/%d utterances", n_done, len(keys))
    return 0


@tool("lattice-best-path")
def lattice_best_path_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.lat.lattice import lattice_best_path
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-best-path [options] <lattice-rspecifier> <words-wspecifier> "
        "[<ali-wspecifier>]"
    )

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.1
        word_symbol_table = ""

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    po.register("word-symbol-table", o, "word_symbol_table")
    args = po.parse(argv)
    if len(args) not in (2, 3):
        print(po.print_usage(), file=sys.stderr)
        return 1
    words_tab = (
        SymbolTable.read(o.word_symbol_table) if o.word_symbol_table else None
    )
    awriter = TableWriter(args[2], "ivec") if len(args) == 3 else None
    with TableWriter(args[1], "text") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            ws, tids, cost = lattice_best_path(lat, o.lm_scale, o.acoustic_scale)
            w[key] = " ".join(
                words_tab[x] if words_tab else str(x) for x in ws
            )
            if awriter is not None:
                awriter[key] = np.asarray(tids, np.int32)
    if awriter is not None:
        awriter.close()
    return 0


@tool("lattice-prune")
def lattice_prune_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.lat.lattice import lattice_prune
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("lattice-prune [options] <lat-rspecifier> <lat-wspecifier>")

    class Opts:
        beam = 4.0
        acoustic_scale = 0.1

    o = Opts()
    po.register("beam", o, "beam")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "lat") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            w[key] = lattice_prune(lat, o.beam, 1.0, o.acoustic_scale)
    return 0


@tool("lattice-scale")
def lattice_scale_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions("lattice-scale [options] <lat-rspecifier> <lat-wspecifier>")

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 1.0

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    from old_kaldi_git_tpu.lat.lattice import INF
    with TableWriter(args[1], "lat") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            for s in range(lat.num_states):
                for a in lat.arcs[s]:
                    a.graph_cost *= o.lm_scale
                    a.acoustic_cost *= o.acoustic_scale
                g, ac = lat.finals[s]
                if g != INF:
                    lat.finals[s] = (g * o.lm_scale, ac * o.acoustic_scale)
            w[key] = lat
    return 0


@tool("lattice-determinize-pruned")
def lattice_determinize_pruned_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.lat.determinize import determinize_lattice_pruned
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-determinize-pruned [options] <lat-rspecifier> <clat-wspecifier>"
    )

    class Opts:
        beam = 10.0
        acoustic_scale = 0.1

    o = Opts()
    po.register("beam", o, "beam")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "clat") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            w[key] = determinize_lattice_pruned(
                lat, o.beam, acoustic_scale=o.acoustic_scale
            )
    return 0


@tool("lattice-lmrescore-const-arpa")
def lattice_lmrescore_const_arpa_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.lat.rescore import lmrescore_compact_lattice
    from old_kaldi_git_tpu.lm.arpa import load_lm
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-lmrescore-const-arpa [options] --words=words.txt "
        "<clat-rspecifier> <const-arpa-or-arpa-file> <clat-wspecifier>"
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


@tool("lattice-to-nbest")
def lattice_to_nbest_tool(argv: List[str]) -> int:
    """N best paths per lattice, written as linear lattices keyed
    <key>-1..<key>-n (reference src/latbin/lattice-to-nbest.cc: the
    scales rank paths; output arcs keep the original separate costs)."""
    from old_kaldi_git_tpu.lat.lattice import (
        lattice_nbest_paths,
        linear_lattice_from_path,
    )
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-to-nbest [options] <lat-rspecifier> <nbest-wspecifier>"
    )

    class Opts:
        n = 10
        lm_scale = 1.0
        acoustic_scale = 0.1

    o = Opts()
    po.register("n", o, "n")
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with TableWriter(args[1], "lat") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            paths = lattice_nbest_paths(lat, o.n, o.lm_scale, o.acoustic_scale)
            for i, (arcs, final) in enumerate(paths):
                w[f"{key}-{i + 1}"] = linear_lattice_from_path(arcs, final)
    return 0


@tool("nbest-to-linear")
def nbest_to_linear_tool(argv: List[str]) -> int:
    """Split linear (n-best) lattices into alignment / word / cost tables
    (reference src/latbin/nbest-to-linear.cc)."""
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "nbest-to-linear <nbest-rspecifier> <ali-wspecifier> "
        "[<words-wspecifier> [<lmcost-wspecifier> [<accost-wspecifier>]]]"
    )
    args = po.parse(argv)
    if len(args) not in (2, 3, 4, 5):
        print(po.print_usage(), file=sys.stderr)
        return 1
    wri = [TableWriter(a, f) for a, f in
           zip(args[1:], ("ivec", "text", "text", "text"))]
    n_err = 0
    for key, lat in SequentialTableReader(args[0], "lat"):
        ali: List[int] = []
        words: List[int] = []
        lm_cost = ac_cost = 0.0
        s, ok = lat.start, True
        seen = 0
        while not lat.is_final(s):
            if len(lat.arcs[s]) != 1 or seen > lat.num_states:
                log.warning("lattice %s is not linear", key)
                n_err += 1
                ok = False
                break
            a = lat.arcs[s][0]
            if a.ilabel:
                ali.append(a.ilabel)
            if a.olabel:
                words.append(a.olabel)
            lm_cost += a.graph_cost
            ac_cost += a.acoustic_cost
            s = a.nextstate
            seen += 1
        if not ok:
            continue
        g, ac = lat.finals[s]
        lm_cost += g
        ac_cost += ac
        wri[0][key] = np.asarray(ali, np.int32)
        if len(wri) > 1:
            wri[1][key] = " ".join(str(x) for x in words)
        if len(wri) > 2:
            wri[2][key] = f"{lm_cost:.6g}"
        if len(wri) > 3:
            wri[3][key] = f"{ac_cost:.6g}"
    for w in wri:
        w.close()
    return 0 if n_err == 0 else 1


@tool("linear-to-nbest")
def linear_to_nbest_tool(argv: List[str]) -> int:
    """Inverse of nbest-to-linear: build linear lattices from alignments +
    words (+ optional costs; reference src/latbin/linear-to-nbest.cc)."""
    from old_kaldi_git_tpu.lat.lattice import Lattice, LatticeArc
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "linear-to-nbest <ali-rspecifier> <words-rspecifier> "
        "<lmcost-rspecifier|''> <accost-rspecifier|''> <nbest-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 5:
        print(po.print_usage(), file=sys.stderr)
        return 1
    words_r = RandomAccessTableReader(args[1], "text")
    lm_r = RandomAccessTableReader(args[2], "text") if args[2] else None
    ac_r = RandomAccessTableReader(args[3], "text") if args[3] else None
    with TableWriter(args[4], "lat") as w:
        for key, ali in SequentialTableReader(args[0], "ivec"):
            if key not in words_r:
                log.warning("no words for %s", key)
                continue
            ws = [int(x) for x in words_r[key].split()]
            lm_cost = float(lm_r[key]) if lm_r is not None else 0.0
            ac_cost = float(ac_r[key]) if ac_r is not None else 0.0
            lat = Lattice()
            cur = lat.add_state(0)
            lat.start = cur
            n = max(len(ali), len(ws), 1)
            for i in range(n):
                tid = int(ali[i]) if i < len(ali) else 0
                wd = ws[i] if i < len(ws) else 0
                nxt = lat.add_state(i + 1 if tid else 0)
                # put all costs on the first arc, like the reference
                g = lm_cost if i == 0 else 0.0
                ac = ac_cost if i == 0 else 0.0
                lat.arcs[cur].append(LatticeArc(tid, wd, g, ac, nxt))
                cur = nxt
            lat.finals[cur] = (0.0, 0.0)
            w[key] = lat
    return 0


@tool("lattice-combine")
def lattice_combine_tool(argv: List[str]) -> int:
    """Union lattices with the same key across several archives
    (reference src/latbin/lattice-combine.cc / fst::Union; --lat-weights
    scales each archive's posterior contribution via added graph cost)."""
    from old_kaldi_git_tpu.lat.lattice import lattice_union
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )

    po = ParseOptions(
        "lattice-combine [options] <lat-rspecifier1> <lat-rspecifier2> "
        "[...] <lat-wspecifier>"
    )

    class Opts:
        lat_weights = ""  # colon-separated, e.g. 0.5:0.5

    o = Opts()
    po.register("lat-weights", o, "lat_weights")
    args = po.parse(argv)
    if len(args) < 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    n_in = len(args) - 1
    weights = ([float(x) for x in o.lat_weights.split(":")]
               if o.lat_weights else [1.0] * n_in)
    if len(weights) != n_in:
        log.error("--lat-weights needs %d values", n_in)
        return 1
    readers = [RandomAccessTableReader(a, "lat") for a in args[1:-1]]
    n_done = 0
    with TableWriter(args[-1], "lat") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            lats, wts = [lat], [weights[0]]
            for r, wt in zip(readers, weights[1:]):
                if key in r:
                    lats.append(r[key])
                    wts.append(wt)
            for la, wt in zip(lats, wts):
                if wt != 1.0:  # -log posterior weight on the start arcs
                    la.arcs[la.start] = [
                        type(a)(a.ilabel, a.olabel,
                                a.graph_cost - math.log(max(wt, 1e-30)),
                                a.acoustic_cost, a.nextstate)
                        for a in la.arcs[la.start]
                    ]
            w[key] = lattice_union(lats) if len(lats) > 1 else lats[0]
            n_done += 1
    log.info("combined %d lattices", n_done)
    return 0


@tool("lattice-mbr-decode")
def lattice_mbr_decode_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.lat.mbr import minimum_bayes_risk
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-mbr-decode [options] <clat-rspecifier> <words-wspecifier> "
        "[<conf-wspecifier>]"
    )

    class Opts:
        lm_scale = 1.0
        acoustic_scale = 0.1
        word_symbol_table = ""

    o = Opts()
    po.register("lm-scale", o, "lm_scale")
    po.register("acoustic-scale", o, "acoustic_scale")
    po.register("word-symbol-table", o, "word_symbol_table")
    args = po.parse(argv)
    if len(args) not in (2, 3):
        print(po.print_usage(), file=sys.stderr)
        return 1
    words_tab = (
        SymbolTable.read(o.word_symbol_table) if o.word_symbol_table else None
    )
    cwriter = TableWriter(args[2], "vec") if len(args) == 3 else None
    with TableWriter(args[1], "text") as w:
        for key, clat in SequentialTableReader(args[0], "clat"):
            res = minimum_bayes_risk(clat, o.lm_scale, o.acoustic_scale)
            if res is None:
                log.warning("MBR failed for %s", key)
                continue
            w[key] = " ".join(
                words_tab[x] if words_tab else str(x) for x in res.words
            )
            if cwriter is not None:
                cwriter[key] = np.asarray(res.confidences, np.float32)
    if cwriter is not None:
        cwriter.close()
    return 0


@tool("nnet3-info")
def nnet3_info_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.models.am_nnet import AmNnet

    po = ParseOptions("nnet3-info <nnet-file>")
    args = po.parse(argv)
    if len(args) != 1:
        print(po.print_usage(), file=sys.stderr)
        return 1
    import jax
    am = AmNnet.load(args[0])
    cfg = am.config
    nparam = sum(int(np.prod(np.shape(x)))
                 for x in jax.tree.leaves(am.variables["params"]))
    print(f"input-dim: {cfg.input_dim}")
    print(f"output-dim: {cfg.num_outputs}")
    print(f"left-context: {cfg.left_context}")
    print(f"right-context: {cfg.right_context}")
    print(f"num-parameters: {nparam}")
    for i, l in enumerate(cfg.layers):
        print(f"layer {i}: {l.kind} dim={l.dim}")
    return 0


@tool("nnet3-compute")
def nnet3_compute_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    po = ParseOptions(
        "nnet3-compute [options] <nnet-file> <feats-rspecifier> "
        "<loglikes-wspecifier>"
    )

    class Opts:
        use_priors = True

    o = Opts()
    po.register("use-priors", o, "use_priors")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    am = AmNnet.load(args[0])
    with TableWriter(args[2], "mat") as w:
        for key, f in SequentialTableReader(args[1], "mat"):
            x = jnp.asarray(f[None])
            out = am.loglikes_batch(x) if o.use_priors else am.logits(x)
            w[key] = np.asarray(out[0])
    return 0


@tool("lattice-oracle")
def lattice_oracle_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.lat.lattice import lattice_oracle
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    po = ParseOptions(
        "lattice-oracle <lat-rspecifier> <ref-rspecifier> <oracle-wspecifier>"
    )
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    refs = {
        k: [int(x) for x in v.split()]
        for k, v in SequentialTableReader(args[1], "text")
    }
    tot_err = tot_words = 0
    with TableWriter(args[2], "text") as w:
        for key, lat in SequentialTableReader(args[0], "lat"):
            if key not in refs:
                continue
            d, words = lattice_oracle(lat, refs[key])
            w[key] = " ".join(str(x) for x in words)
            tot_err += d
            tot_words += len(refs[key])
    print(f"%WER {100.0 * tot_err / max(tot_words, 1):.2f} "
          f"[ {tot_err} / {tot_words} ] (oracle)")
    return 0


@tool("lattice-depth")
def lattice_depth_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.lat.lattice import lattice_depth
    from old_kaldi_git_tpu.utils.table import SequentialTableReader

    po = ParseOptions("lattice-depth <lat-rspecifier>")
    args = po.parse(argv)
    if len(args) != 1:
        print(po.print_usage(), file=sys.stderr)
        return 1
    tot = n = 0.0
    for key, lat in SequentialTableReader(args[0], "lat"):
        d = lattice_depth(lat)
        print(f"{key} {d:.2f}")
        tot += d
        n += 1
    if n:
        print(f"mean depth {tot / n:.2f} over {int(n)} lattices")
    return 0


@tool("prepare-lang")
def prepare_lang_tool(argv: List[str]) -> int:
    """lexicon.txt (word phone phone ...) → lang dir (words/phones/L fsts);
    the utils/prepare_lang.sh role."""
    from old_kaldi_git_tpu.fst.lang import Lang, Lexicon

    po = ParseOptions(
        "prepare-lang [options] <lexicon.txt> <lang-dir>"
    )

    class Opts:
        silence_phone = "SIL"
        sil_prob = 0.5

    o = Opts()
    po.register("silence-phone", o, "silence_phone")
    po.register("sil-prob", o, "sil_prob")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    import os

    lex: Dict[str, list] = {}
    with open(args[0]) as f:
        for ln in f:
            parts = ln.split()
            if len(parts) >= 2:
                lex.setdefault(parts[0], []).append(" ".join(parts[1:]))
    # list-of-lists form: unambiguous for words with multiple prons,
    # including multiple SINGLE-phone prons (the list-of-strings form would
    # misread ['ah', 'ey'] as one two-phone pronunciation)
    lang = Lang(
        Lexicon.from_dict({w: [p.split() for p in v] for w, v in lex.items()}),
        silence_phone=o.silence_phone, sil_prob=o.sil_prob,
    )
    os.makedirs(args[1], exist_ok=True)
    lang.words.write(os.path.join(args[1], "words.txt"))
    lang.phones.write(os.path.join(args[1], "phones.txt"))
    with open(os.path.join(args[1], "L.fst"), "wb") as f:
        lang.L.write(f)
    with open(os.path.join(args[1], "L_disambig.fst"), "wb") as f:
        lang.L_disambig.write(f)
    with open(os.path.join(args[1], "lexicon.txt"), "w") as f:
        for w, prons in lex.items():
            for p in prons:
                f.write(f"{w} {p}\n")
    log.info("prepare-lang: %d words, %d phones → %s",
             len(lang.words) - 2, len(lang.phones), args[1])
    return 0


@tool("mkgraph")
def mkgraph_tool(argv: List[str]) -> int:
    """lang dir + ARPA LM + model → HCLG.fst (the utils/mkgraph.sh role).
    The lang dir must come from prepare-lang (lexicon.txt is reread so the
    Lang object can be rebuilt with its original pronunciations)."""
    from old_kaldi_git_tpu.decoder.graph import mkgraph
    from old_kaldi_git_tpu.fst.lang import Lang, Lexicon
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.lm.arpa import arpa_to_fst, parse_arpa

    po = ParseOptions(
        "mkgraph [options] <lang-dir> <arpa-file> <model> <graph-dir>"
    )

    class Opts:
        self_loop_scale = 0.1
        silence_phone = "SIL"
        sil_prob = 0.5
        tree = ""  # ContextDependency file for context-dependent models

    o = Opts()
    po.register("self-loop-scale", o, "self_loop_scale")
    po.register("silence-phone", o, "silence_phone")
    po.register("sil-prob", o, "sil_prob")
    po.register("tree", o, "tree")
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    import os

    lex: Dict[str, list] = {}
    with open(os.path.join(args[0], "lexicon.txt")) as f:
        for ln in f:
            parts = ln.split()
            if len(parts) >= 2:
                lex.setdefault(parts[0], []).append(" ".join(parts[1:]))
    # list-of-lists form: unambiguous for words with multiple prons,
    # including multiple SINGLE-phone prons (the list-of-strings form would
    # misread ['ah', 'ey'] as one two-phone pronunciation)
    lang = Lang(
        Lexicon.from_dict({w: [p.split() for p in v] for w, v in lex.items()}),
        silence_phone=o.silence_phone, sil_prob=o.sil_prob,
    )
    with open(args[1]) as f:
        lm = parse_arpa(f.read())
    g = arpa_to_fst(lm, lang.words)
    model = AmGmmModel.load(args[2])
    # the model's tree/topology define the context-dependency
    from old_kaldi_git_tpu.tree.context_dep import monophone_context_dependency

    tm = model.tm
    if o.tree:
        from old_kaldi_git_tpu.tree.context_dep import ContextDependency

        with open(o.tree, "rb") as f:
            ctx_dep = ContextDependency.read(f)
    else:
        phones = lang.real_phone_ids
        ctx_dep = monophone_context_dependency(
            phones, {p: tm.topo.num_pdf_classes(p) for p in phones}
        )
    hclg = mkgraph(lang, g, ctx_dep, tm, self_loop_scale=o.self_loop_scale)
    os.makedirs(args[3], exist_ok=True)
    with open(os.path.join(args[3], "HCLG.fst"), "wb") as f:
        hclg.write(f)
    lang.words.write(os.path.join(args[3], "words.txt"))
    log.info("mkgraph: HCLG %d states / %d arcs → %s",
             hclg.num_states, hclg.num_arcs, args[3])
    return 0


@tool("online-wav-gmm-latgen-faster")
def online_wav_gmm_latgen_tool(argv: List[str]) -> int:
    """Simulated-real-time streaming decode of wav files (the
    online2-wav-*-latgen-faster role): chunked audio → streaming features →
    streaming decoder with endpointing; prints partials, finals and RTF."""
    from old_kaldi_git_tpu.decoder.csr import fst_to_csr
    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions
    from old_kaldi_git_tpu.feat.compute import MfccOptions
    from old_kaldi_git_tpu.fst.symbols import SymbolTable
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst
    from old_kaldi_git_tpu.gmm.diag_gmm import AmGmmModel
    from old_kaldi_git_tpu.online.streaming import (
        OnlineFeaturePipeline,
        StreamingDecoder,
    )
    from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter

    jnp = _jnp()
    po = ParseOptions(
        "online-wav-gmm-latgen-faster [options] <model> <hclg-fst> "
        "<wav-rspecifier> <words-wspecifier>"
    )

    class Opts:
        beam = 16.0
        max_active = 7000
        acoustic_scale = 0.1
        chunk_seconds = 0.5
        word_symbol_table = ""
        samp_freq = 16000.0
        silence_phone_id = 1

    o = Opts()
    for name, attr in (("beam", "beam"), ("max-active", "max_active"),
                       ("acoustic-scale", "acoustic_scale"),
                       ("chunk-seconds", "chunk_seconds"),
                       ("word-symbol-table", "word_symbol_table"),
                       ("samp-freq", "samp_freq"),
                       ("silence-phone-id", "silence_phone_id")):
        po.register(name, o, attr)
    args = po.parse(argv)
    if len(args) != 4:
        print(po.print_usage(), file=sys.stderr)
        return 1
    import time as _time

    model = AmGmmModel.load(args[0])
    with open(args[1], "rb") as f:
        hclg = VectorFst.read(f)
    csr = fst_to_csr(hclg, model.tm.tid_to_pdf_array())
    words_tab = (
        SymbolTable.read(o.word_symbol_table) if o.word_symbol_table else None
    )
    mfcc_opts = MfccOptions()
    mfcc_opts.frame_opts.samp_freq = o.samp_freq
    mfcc_opts.frame_opts.dither = 0.0

    def am_fn(feats):
        return jnp.asarray(
            model.am.loglikes_numpy(np.asarray(feats[0]))[None]
        )

    vopts = ViterbiOptions(beam=o.beam, max_active=o.max_active,
                           acoustic_scale=o.acoustic_scale)
    chunk = int(o.chunk_seconds * o.samp_freq)
    tot_audio = tot_wall = 0.0
    with TableWriter(args[3], "text") as w:
        for key, wave in SequentialTableReader(args[2], "wav"):
            pipe = OnlineFeaturePipeline(mfcc_opts)
            dec = StreamingDecoder(
                csr, am_fn, silence_phones=[o.silence_phone_id],
                tid_to_phone=model.tm.tid_to_phone_array(), opts=vopts,
            )
            samples = wave.data[0]
            t0 = _time.perf_counter()
            for lo in range(0, len(samples), chunk):
                feats = pipe.accept_waveform(samples[lo: lo + chunk])
                dec.advance(feats)
                if dec.endpoint_detected():
                    log.info("%s: endpoint detected", key)
                    break
            dec.advance(pipe.input_finished(), final=True)
            wall = _time.perf_counter() - t0
            hyp = dec.best_words()
            text = " ".join(
                words_tab[x] if words_tab else str(x) for x in hyp
            )
            w[key] = text
            dur = len(samples) / o.samp_freq
            tot_audio += dur
            tot_wall += wall
            print(f"{key} ({dur:.2f}s, RTF {wall / max(dur, 1e-9):.3f}): {text}")
    if tot_audio:
        print(f"overall RTF {tot_wall / tot_audio:.3f} "
              f"({tot_audio:.1f}s audio in {tot_wall:.1f}s)")
    return 0


def _read_fst(path: str):
    from old_kaldi_git_tpu.fst.vector_fst import VectorFst

    with open(path, "rb") as f:
        return VectorFst.read(f)


def _write_fst(fst, path: str) -> int:
    with open(path, "wb") as f:
        fst.write(f)
    return 0


@tool("fstcompose")
def fstcompose_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.algorithms import compose

    po = ParseOptions("fstcompose <fst1> <fst2> <out-fst>")
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    return _write_fst(compose(_read_fst(args[0]), _read_fst(args[1])), args[2])


@tool("fstdeterminizestar")
def fstdeterminizestar_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.algorithms import determinize_star

    po = ParseOptions("fstdeterminizestar [--use-log=bool] <fst> <out-fst>")

    class Opts:
        use_log = False

    o = Opts()
    po.register("use-log", o, "use_log")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    return _write_fst(
        determinize_star(_read_fst(args[0]), use_log=o.use_log), args[1]
    )


@tool("fstminimizeencoded")
def fstminimizeencoded_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.algorithms import minimize_encoded

    po = ParseOptions("fstminimizeencoded <fst> <out-fst>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    return _write_fst(minimize_encoded(_read_fst(args[0])), args[1])


@tool("fstpushspecial")
def fstpushspecial_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.algorithms import push_special

    po = ParseOptions("fstpushspecial <fst> <out-fst>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    fst = _read_fst(args[0])
    push_special(fst)
    return _write_fst(fst, args[1])


@tool("fstrmepslocal")
def fstrmepslocal_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.algorithms import remove_eps_local

    po = ParseOptions("fstrmepslocal <fst> <out-fst>")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    fst = _read_fst(args[0])
    remove_eps_local(fst)
    return _write_fst(fst, args[1])


@tool("fstrmsymbols")
def fstrmsymbols_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.algorithms import rm_symbols

    po = ParseOptions(
        "fstrmsymbols <symbol-list-file> <fst> <out-fst>  "
        "(replaces listed input symbols with epsilon)"
    )
    args = po.parse(argv)
    if len(args) != 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    with open(args[0]) as f:
        labels = [int(x) for x in f.read().split()]
    fst = _read_fst(args[1])
    rm_symbols(fst, labels, side="input")
    return _write_fst(fst, args[2])


@tool("fstproject")
def fstproject_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.algorithms import project

    po = ParseOptions("fstproject [--project-output=bool] <fst> <out-fst>")

    class Opts:
        project_output = False

    o = Opts()
    po.register("project-output", o, "project_output")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    return _write_fst(
        project(_read_fst(args[0]),
                "output" if o.project_output else "input"),
        args[1],
    )


@tool("fstshortestpath")
def fstshortestpath_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.fst.algorithms import shortest_path

    po = ParseOptions("fstshortestpath <fst>   (prints cost, ilabels, olabels)")
    args = po.parse(argv)
    if len(args) != 1:
        print(po.print_usage(), file=sys.stderr)
        return 1
    cost, ils, ols = shortest_path(_read_fst(args[0]))
    print(f"cost {cost:.6g}")
    print("ilabels " + " ".join(str(x) for x in ils))
    print("olabels " + " ".join(str(x) for x in ols))
    return 0


@tool("nnet3-average")
def nnet3_average_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.models.am_nnet import AmNnet
    from old_kaldi_git_tpu.models.train import average_models

    po = ParseOptions("nnet3-average <model1> <model2> [...] <model-out>")
    args = po.parse(argv)
    if len(args) < 3:
        print(po.print_usage(), file=sys.stderr)
        return 1
    ams = [AmNnet.load(p) for p in args[:-1]]
    average_models(ams).save(args[-1])
    log.info("averaged %d models -> %s", len(ams), args[-1])
    return 0


@tool("wav-reverberate")
def wav_reverberate_tool(argv: List[str]) -> int:
    from old_kaldi_git_tpu.feat.signal import add_noise, reverberate
    from old_kaldi_git_tpu.utils.table import (
        RandomAccessTableReader,
        SequentialTableReader,
        TableWriter,
    )
    from old_kaldi_git_tpu.utils.wav import WaveData

    po = ParseOptions(
        "wav-reverberate [options] <wav-rspecifier> <wav-wspecifier>"
    )

    class Opts:
        impulse_response = ""  # wav file with the RIR
        additive_noise = ""  # wav rspecifier; mixed per utterance (by key)
        snr_db = 20.0
        volume = 0.0  # 0 = auto power normalization
        seed = 0  # noise-window randomization (reproducible per run)

    o = Opts()
    po.register("impulse-response", o, "impulse_response")
    po.register("additive-noise", o, "additive_noise")
    po.register("snr-db", o, "snr_db")
    po.register("volume", o, "volume")
    po.register("seed", o, "seed")
    args = po.parse(argv)
    if len(args) != 2:
        print(po.print_usage(), file=sys.stderr)
        return 1
    rir = None
    if o.impulse_response:
        from old_kaldi_git_tpu.utils.wav import read_wav

        rir = read_wav(o.impulse_response).data[0]
    noises = (
        RandomAccessTableReader(o.additive_noise, "wav")
        if o.additive_noise else None
    )
    rng = np.random.default_rng(o.seed)  # one stream: windows vary per utt
    with TableWriter(args[1], "wav") as w:
        for key, wave in SequentialTableReader(args[0], "wav"):
            sig = wave.data[0]
            if rir is not None:
                sig = reverberate(
                    sig, rir, volume=o.volume if o.volume else None
                )
            if noises is not None and key in noises:
                sig = add_noise(sig, noises[key].data[0], o.snr_db, rng=rng)
            w[key] = WaveData(samp_freq=wave.samp_freq, data=sig[None])
    return 0


# registration side-effect: the training-pipeline tool batch
from old_kaldi_git_tpu.bin import train_tools  # noqa: E402,F401  (isort:skip)
from old_kaldi_git_tpu.bin import spkid_tools  # noqa: E402,F401  (isort:skip)
from old_kaldi_git_tpu.bin import lat_tools  # noqa: E402,F401  (isort:skip)
from old_kaldi_git_tpu.bin import nnet3_tools  # noqa: E402,F401  (isort:skip)
from old_kaldi_git_tpu.bin import util_tools  # noqa: E402,F401  (isort:skip)
from old_kaldi_git_tpu.bin import kws_tools  # noqa: E402,F401  (isort:skip)
from old_kaldi_git_tpu.bin import sgmm2_tools  # noqa: E402,F401  (isort:skip)
