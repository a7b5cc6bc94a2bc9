"""Speaker-recognition tool chain end-to-end (reference src/ivectorbin):

energy VAD → select-voiced-frames → diag UBM (gmm-global-*) → full-cov UBM
(fgmm-global-*) → T-matrix EM (ivector-extractor-*) → ivector-extract →
mean/length normalization → LDA → PLDA scoring → EER, plus the
logistic-regression language-id backend.  Tools run in-process via the
TOOLS registry (same code path as python -m old_kaldi_git_tpu.bin).
"""

import os

import numpy as np
import pytest

from old_kaldi_git_tpu.bin.tools import TOOLS
from old_kaldi_git_tpu.utils.table import SequentialTableReader, TableWriter


def tool(name, *args):
    rc = TOOLS[name](list(args))
    assert rc == 0, f"{name} failed rc={rc}"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("spkid")
    os.chdir(root)
    rng = np.random.default_rng(0)
    dim, num_spk, per_spk = 8, 6, 5
    clusters = rng.standard_normal((5, dim)) * 3.0
    basis = rng.standard_normal((2, dim))
    spk_off = rng.standard_normal((num_spk, 2)) @ basis * 0.8
    utt2spk = {}
    with TableWriter("ark:feats.ark", "mat") as w:
        for s in range(num_spk):
            for u in range(per_spk):
                key = f"s{s}-u{u}"
                which = rng.integers(0, 5, size=150)
                w[key] = (clusters[which] + spk_off[s]
                          + 0.6 * rng.standard_normal((150, dim))
                          ).astype(np.float32)
                utt2spk[key] = f"s{s}"
    with open("utt2spk", "w") as f:
        for u, s in sorted(utt2spk.items()):
            f.write(f"{u} {s}\n")
    spk2utt = {}
    for u, s in utt2spk.items():
        spk2utt.setdefault(s, []).append(u)
    with open("spk2utt", "w") as f:
        for s, us in sorted(spk2utt.items()):
            f.write(f"{s} {' '.join(sorted(us))}\n")
    return root, utt2spk, spk2utt


def test_ubm_chain(corpus):
    tool("gmm-global-init-from-feats", "--num-gauss=8", "--num-iters=4",
         "ark:feats.ark", "ubm0.diag")
    tool("gmm-gselect", "--n=4", "ubm0.diag", "ark:feats.ark",
         "ark:gsel.ark")
    # two parallel acc jobs + sum == map-reduce E-step
    tool("gmm-global-acc-stats", "--gselect=ark:gsel.ark", "ubm0.diag",
         "ark:feats.ark", "diag.1.acc")
    tool("gmm-global-sum-accs", "diag.sum.acc", "diag.1.acc", "diag.1.acc")
    tool("gmm-global-est", "--mix-up=10", "ubm0.diag", "diag.sum.acc",
         "ubm1.diag")
    r = TOOLS["gmm-global-info"](["ubm1.diag"])
    assert r == 0
    tool("gmm-global-to-fgmm", "ubm1.diag", "ubm1.full")
    tool("fgmm-gselect", "--n=4", "ubm1.full", "ark:feats.ark",
         "ark:gsel_f.ark")
    tool("fgmm-global-acc-stats", "--gselect=ark:gsel_f.ark", "ubm1.full",
         "ark:feats.ark", "full.1.acc")
    tool("fgmm-global-sum-accs", "full.sum.acc", "full.1.acc")
    tool("fgmm-global-est", "--min-gaussian-occupancy=3", "ubm1.full",
         "full.sum.acc", "final.ubm")
    tool("fgmm-global-to-gmm", "final.ubm", "final.dubm")
    from old_kaldi_git_tpu.bin.spkid_tools import _load_gmm
    full = _load_gmm("final.ubm")
    assert hasattr(full, "covars") and full.num_mix == 10


def test_gselect_posteriors_normalized(corpus):
    tool("gmm-global-get-post", "--n=3", "ubm1.diag", "ark:feats.ark",
         "ark:post.ark")
    posts = dict(SequentialTableReader("ark:post.ark", "post"))
    some = next(iter(posts.values()))
    for frame in some[:10]:
        assert abs(sum(p for _, p in frame) - 1.0) < 1e-4
        assert len(frame) <= 3


def test_ivector_chain_and_plda_eer(corpus):
    root, utt2spk, spk2utt = corpus
    tool("ivector-extractor-init", "--ivector-dim=4", "final.ubm", "ie.0")
    for it in range(3):
        tool("ivector-extractor-acc-stats", f"ie.{it}", "ark:feats.ark",
             "ie.acc.1")
        tool("ivector-extractor-sum-accs", "ie.acc", "ie.acc.1")
        tool("ivector-extractor-est", f"ie.{it}", "ie.acc", f"ie.{it + 1}")
    tool("ivector-extract", "ie.3", "ark:feats.ark", "ark:ivec.ark")
    ivecs = {k: np.asarray(v) for k, v in
             SequentialTableReader("ark:ivec.ark", "vec")}
    assert len(ivecs) == len(utt2spk) and len(next(iter(ivecs.values()))) == 4

    # spk-level extraction (pooled stats) + ivector-mean variants
    tool("ivector-extract", "--spk2utt=spk2utt", "ie.3", "ark:feats.ark",
         "ark:spk_ivec_pooled.ark")
    tool("ivector-mean", "spk2utt", "ark:ivec.ark", "ark:spk_ivec.ark",
         "ark:num_utts.ark")
    tool("ivector-mean", "ark:ivec.ark", "global.mean")
    tool("ivector-subtract-global-mean", "global.mean", "ark:ivec.ark",
         "ark:ivec_c.ark")
    centered = np.stack([np.asarray(v) for _, v in
                         SequentialTableReader("ark:ivec_c.ark", "vec")])
    assert np.abs(centered.mean(0)).max() < 1e-4
    tool("ivector-normalize-length", "ark:ivec_c.ark", "ark:ivec_n.ark")
    normed = {k: np.asarray(v) for k, v in
              SequentialTableReader("ark:ivec_n.ark", "vec")}
    for v in normed.values():
        assert abs(np.linalg.norm(v) - 2.0) < 1e-4  # sqrt(dim)=2

    # LDA on centered ivectors
    tool("ivector-compute-lda", "--dim=2", "ark:ivec_n.ark", "utt2spk",
         "lda.mat")
    tool("ivector-transform", "lda.mat", "ark:ivec_n.ark", "ark:ivec_l.ark")
    lvecs = dict(SequentialTableReader("ark:ivec_l.ark", "vec"))
    assert len(np.asarray(next(iter(lvecs.values())))) == 2

    # PLDA: enroll = spk means, test = utt ivectors; EER must beat chance
    tool("ivector-compute-plda", "spk2utt", "ark:ivec_n.ark", "plda")
    tool("ivector-mean", "spk2utt", "ark:ivec_n.ark", "ark:enroll.ark",
         "ark:enroll_n.ark")
    with open("trials", "w") as f:
        for u in sorted(utt2spk):
            for s in sorted(spk2utt):
                f.write(f"{s} {u}\n")
    tool("ivector-plda-scoring", "--num-utts=ark:enroll_n.ark", "plda",
         "ark:enroll.ark", "ark:ivec_n.ark", "trials", "scores")
    with open("scores") as f, open("eer_in", "w") as out:
        for ln in f:
            s, u, score = ln.split()
            kind = "target" if utt2spk[u] == s else "nontarget"
            out.write(f"{score} {kind}\n")
    from old_kaldi_git_tpu.bin.spkid_tools import compute_eer
    tgt, non = [], []
    for ln in open("eer_in"):
        sc, kind = ln.split()
        (tgt if kind == "target" else non).append(float(sc))
    eer, _ = compute_eer(np.asarray(tgt), np.asarray(non))
    assert eer < 0.15, f"EER {eer:.3f} too high"
    tool("compute-eer", "eer_in")


def test_logistic_regression_backend(corpus):
    root, utt2spk, _ = corpus
    tool("logistic-regression-train", "--max-steps=150", "--mix-up=8",
         "ark:ivec_n.ark", "utt2spk", "logistic.mdl")
    tool("logistic-regression-eval", "logistic.mdl", "ark:ivec_n.ark",
         "ark:lr_post.ark")
    labels = sorted(set(utt2spk.values()))
    correct = total = 0
    for k, v in SequentialTableReader("ark:lr_post.ark", "vec"):
        post = np.asarray(v)
        assert abs(np.exp(post).sum() - 1.0) < 1e-3
        correct += labels[int(post.argmax())] == utt2spk[k]
        total += 1
    assert correct / total > 0.8, f"LR accuracy {correct}/{total}"


def test_select_voiced_frames(corpus):
    feats = dict(SequentialTableReader("ark:feats.ark", "mat"))
    key = next(iter(feats))
    T = feats[key].shape[0]
    vad = np.zeros(T, np.float32)
    vad[10:60] = 1.0
    with TableWriter("ark:vad.ark", "vec") as w:
        w[key] = vad
    tool("select-voiced-frames", "ark:feats.ark", "ark:vad.ark",
         "ark:voiced.ark")
    voiced = dict(SequentialTableReader("ark:voiced.ark", "mat"))
    assert list(voiced) == [key]
    np.testing.assert_allclose(voiced[key], feats[key][10:60], rtol=1e-6)


def test_ivector_extract_online2(corpus):
    """Online i-vectors: matrix output at the feature frame rate; values
    constant within each period; last-period row ≈ the utterance i-vector
    direction as stats accumulate."""
    root, utt2spk, spk2utt = corpus
    tool("ivector-extractor-init", "--ivector-dim=4", "final.ubm", "oie.0")
    tool("ivector-extractor-acc-stats", "oie.0", "ark:feats.ark", "oie.acc1")
    tool("ivector-extractor-sum-accs", "oie.acc", "oie.acc1")
    tool("ivector-extractor-est", "oie.0", "oie.acc", "oie.1")
    tool("ivector-extract-online2", "--ivector-period=25", "oie.1",
         "ark:feats.ark", "ark:oiv.ark")
    feats = {k: np.asarray(v) for k, v in
             SequentialTableReader("ark:feats.ark", "mat")}
    oiv = {k: np.asarray(v) for k, v in
           SequentialTableReader("ark:oiv.ark", "mat")}
    assert set(oiv) == set(feats)
    k0 = sorted(oiv)[0]
    m = oiv[k0]
    assert m.shape == (feats[k0].shape[0], 4)
    # constant within a period, changing across periods
    assert np.allclose(m[0], m[24]) and not np.allclose(m[0], m[25])
