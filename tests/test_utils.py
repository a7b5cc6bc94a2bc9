"""M0 tests: binary io round-trips, table io, wav, options, WER, data dirs."""

import io
import os

import numpy as np
import pytest

from old_kaldi_git_tpu.utils import io_funcs as iof
from old_kaldi_git_tpu.utils.table import (
    RandomAccessTableReader,
    SequentialTableReader,
    TableWriter,
    read_table,
)
from old_kaldi_git_tpu.utils.parse_options import ParseOptions, options_dataclass
from old_kaldi_git_tpu.utils.wav import WaveData, read_wav, write_wav
from old_kaldi_git_tpu.utils.data_dir import DataDir
from old_kaldi_git_tpu.utils.edit_distance import compute_wer, edit_distance


def test_matrix_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(3, 5), (1, 1), (10, 13)]:
        m = rng.normal(size=shape).astype(np.float32)
        buf = io.BytesIO()
        iof.write_matrix(buf, m)
        buf.seek(0)
        out = iof.read_matrix(buf)
        np.testing.assert_array_equal(m, out)


def test_vector_and_intvec_roundtrip():
    v = np.arange(7, dtype=np.float32) * 0.5
    buf = io.BytesIO()
    iof.write_vector(buf, v)
    buf.seek(0)
    np.testing.assert_array_equal(v, iof.read_vector(buf))

    iv = np.array([3, 1, 4, 1, 5, 9], dtype=np.int32)
    buf = io.BytesIO()
    iof.write_int_vector(buf, iv)
    buf.seek(0)
    np.testing.assert_array_equal(iv, iof.read_int_vector(buf))


def test_token_framing():
    buf = io.BytesIO()
    iof.write_token(buf, "<TransitionModel>")
    iof.write_int32(buf, 42)
    iof.write_token(buf, "</TransitionModel>")
    buf.seek(0)
    iof.expect_token(buf, "<TransitionModel>")
    assert iof.read_int32(buf) == 42
    iof.expect_token(buf, "</TransitionModel>")


def test_text_matrix_roundtrip():
    m = np.array([[1.5, -2.0], [0.25, 3.0]], dtype=np.float32)
    text = iof.format_matrix_text(m)
    np.testing.assert_allclose(iof.parse_matrix_text(text), m, rtol=1e-6)


def test_ark_scp_table(tmp_path):
    rng = np.random.default_rng(1)
    mats = {f"utt{i:02d}": rng.normal(size=(4 + i, 6)).astype(np.float32) for i in range(5)}
    ark = tmp_path / "feats.ark"
    scp = tmp_path / "feats.scp"
    with TableWriter(f"ark,scp:{ark},{scp}", "mat") as w:
        for k, v in mats.items():
            w[k] = v

    seq = dict(SequentialTableReader(f"ark:{ark}", "mat"))
    assert list(seq) == list(mats)
    for k in mats:
        np.testing.assert_array_equal(seq[k], mats[k])

    ra = RandomAccessTableReader(f"scp:{scp}", "mat")
    np.testing.assert_array_equal(ra["utt03"], mats["utt03"])
    assert "nope" not in ra


def test_text_archive_int_vectors(tmp_path):
    ali = {"a": np.array([1, 2, 3], np.int32), "b": np.array([], np.int32)}
    p = tmp_path / "ali.txt"
    with TableWriter(f"ark,t:{p}", "ivec") as w:
        for k, v in ali.items():
            w[k] = v
    back = read_table(f"ark:{p}", "ivec")
    np.testing.assert_array_equal(back["a"], ali["a"])
    assert back["b"].size == 0


def test_pipe_rspecifier(tmp_path):
    m = np.ones((2, 3), np.float32)
    ark = tmp_path / "x.ark"
    with TableWriter(f"ark:{ark}", "mat") as w:
        w["u1"] = m
    got = read_table(f"ark:cat {ark} |", "mat")
    np.testing.assert_array_equal(got["u1"], m)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    samples = (rng.normal(size=16000) * 1000).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(str(p), samples, 8000.0)
    wave = read_wav(str(p))
    assert wave.samp_freq == 8000.0
    assert wave.data.shape == (1, 16000)
    np.testing.assert_allclose(wave.data[0], np.round(samples), atol=0.51)


def test_parse_options():
    @options_dataclass
    class Opts:
        beam: float = 16.0
        max_active: int = 7000
        use_energy: bool = True

    po = ParseOptions("test")
    opts = Opts()
    po.register_dataclass(opts)
    pos = po.parse(["--beam=11.0", "--max-active=200", "--use-energy=false", "in.ark", "out.ark"])
    assert pos == ["in.ark", "out.ark"]
    assert opts.beam == 11.0 and opts.max_active == 200 and opts.use_energy is False


def test_parse_options_prefix_and_config(tmp_path):
    @options_dataclass
    class Sub:
        dim: int = 13

    conf = tmp_path / "x.conf"
    conf.write_text("--mfcc-dim=23\n")
    po = ParseOptions("t")
    sub = Sub()
    po.register_dataclass(sub, prefix="mfcc")
    po.parse([f"--config={conf}"])
    assert sub.dim == 23


def test_edit_distance():
    s = edit_distance("a b c d".split(), "a x c".split())
    assert s.errors == 2 and s.sub == 1 and s.dele == 1 and s.ins == 0
    total = compute_wer({"u": "yes no".split()}, {"u": "yes no".split()})
    assert total.wer == 0.0
    assert "%WER" in total.report()


def test_data_dir(tmp_path):
    d = DataDir.create(
        str(tmp_path / "data"),
        wav_scp={"s1_u1": "/x/1.wav", "s1_u2": "/x/2.wav", "s2_u1": "/x/3.wav"},
        text={"s1_u1": "yes", "s1_u2": "no", "s2_u1": "yes yes"},
        utt2spk={"s1_u1": "s1", "s1_u2": "s1", "s2_u1": "s2"},
    )
    assert d.utts == ["s1_u1", "s1_u2", "s2_u1"]
    assert d.spk2utt == {"s1": ["s1_u1", "s1_u2"], "s2": ["s2_u1"]}
    shards = d.split(2)
    assert sum(len(s) for s in shards) == 3
    # speakers not split across shards
    for s in shards:
        assert all(d.utt2spk[u] in {d.utt2spk[x] for x in s} for u in s)


def test_cli_pipeline(tmp_path):
    """Shell-style CLI tools compose via pipes (bin/ parity layer)."""
    import math
    import subprocess
    import sys as _sys

    from old_kaldi_git_tpu.utils.wav import write_wav

    rng = np.random.default_rng(0)
    scp = tmp_path / "wav.scp"
    lines = []
    for i in range(2):
        t = np.arange(8000) / 16000.0
        sig = (3000 * np.sin(2 * math.pi * (300 + 200 * i) * t)).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        write_wav(str(p), sig, 16000.0)
        lines.append(f"u{i} {p}")
    scp.write_text("\n".join(lines) + "\n")

    def run(args, **kw):
        return subprocess.run(
            [_sys.executable, "-m", "old_kaldi_git_tpu.bin"] + args,
            check=True, capture_output=True, text=True, cwd=str(tmp_path),
            env={**os.environ, "PYTHONPATH": os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))},
            **kw,
        )

    run(["compute-mfcc-feats", "--dither=0.0", f"scp:{scp}", "ark:mfcc.ark"])
    run(["compute-cmvn-stats", "ark:mfcc.ark", "ark:cmvn.ark"])
    run(["apply-cmvn", "ark:cmvn.ark", "ark:mfcc.ark", "ark:norm.ark"])
    run(["add-deltas", "ark:norm.ark", "ark:final.ark"])
    from old_kaldi_git_tpu.utils.table import read_table

    feats = read_table(f"ark:{tmp_path}/final.ark", "mat")
    assert set(feats) == {"u0", "u1"} and feats["u0"].shape[1] == 39

    (tmp_path / "ref.txt").write_text("u0 yes no\nu1 no\n")
    (tmp_path / "hyp.txt").write_text("u0 yes no\nu1 yes\n")
    out = run(["compute-wer", "ark:ref.txt", "ark:hyp.txt"])
    assert "%WER 33.33" in out.stdout


def test_compressed_matrix_roundtrip(tmp_path):
    """CM write → read reproduces features within quantization error."""
    import io
    from old_kaldi_git_tpu.utils import io_funcs as kio_f
    from old_kaldi_git_tpu.utils.table import TableWriter, read_table

    rng = np.random.default_rng(0)
    mat = rng.normal(size=(50, 13)).astype(np.float32) * 10
    buf = io.BytesIO()
    kio_f.write_compressed_matrix(buf, mat)
    buf.seek(0)
    back = kio_f.read_matrix(buf)
    assert back.shape == mat.shape
    err = np.abs(back - mat).max()
    rng_size = mat.max() - mat.min()
    assert err < rng_size / 60  # 8-bit codes across 3 bands

    # through the table layer: cmat write, mat read
    with TableWriter(f"ark:{tmp_path}/c.ark", "cmat") as w:
        w["u0"] = mat
    got = read_table(f"ark:{tmp_path}/c.ark", "mat")
    assert np.abs(got["u0"] - mat).max() < rng_size / 60
    # compression actually compresses (~4x vs f32)
    import os as _os
    assert _os.path.getsize(tmp_path / "c.ark") < mat.nbytes / 2


def test_pipeline_stages(tmp_path):
    """Stage gating: --stage resume, artifact skip, shared context."""
    from old_kaldi_git_tpu.utils.pipeline import Pipeline

    ran = []

    def build(stage):
        pipe = Pipeline(str(tmp_path), stage=stage, log_to_files=True)

        @pipe.stage(10, "make data", produces="data.txt")
        def _s10(ctx):
            ran.append(10)
            with open(ctx.path("data.txt"), "w") as f:
                f.write("data")

        @pipe.stage(20, "train", produces="final.mdl")
        def _s20(ctx):
            ran.append(20)
            ctx.model = "M"
            with open(ctx.path("final.mdl"), "w") as f:
                f.write("model")

        @pipe.stage(30, "decode")
        def _s30(ctx):
            ran.append(30)
            ctx.decoded = True

        return pipe

    pipe = build(stage=0)
    ctx = pipe.run()
    assert ran == [10, 20, 30] and ctx.decoded
    assert (tmp_path / "log" / "20.train.log").exists()

    # second run: artifact stages skipped, stage 30 (no artifact) reruns
    ran.clear()
    build(stage=0).run()
    assert ran == [30]

    # --stage 30 skips earlier stages even without artifacts
    (tmp_path / "data.txt").unlink()
    ran.clear()
    build(stage=30).run()
    assert ran == [30]


def test_profiling_utilities():
    """time_jitted / profile accumulator / roofline (SURVEY §5 tracing)."""
    import jax.numpy as jnp

    from old_kaldi_git_tpu.utils.profiling import (
        print_profile,
        profile,
        roofline,
        time_jitted,
    )

    import jax

    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    t = time_jitted(f, x, iters=2)
    assert 0 < t < 10
    with profile("unit-test-section"):
        pass
    out = print_profile(reset=True)
    assert "unit-test-section" in out
    # 2*N^3 flops matmul at N=4096 (AI ≈ 687 flops/byte): compute-bound
    r = roofline(flops=2 * 4096**3, bytes_moved=3 * 4 * 4096**2,
                 seconds=1e-3)
    assert r["bound"] == "compute" and r["achieved_tflops"] > 0
    # streaming-style op: memory-bound
    r2 = roofline(flops=1024, bytes_moved=1 << 30, seconds=1e-2)
    assert r2["bound"] == "memory"
    assert 0 < r2["frac_of_peak"] < 1


# ---------------------------------------------------------------------------
# host thread pool (reference util/kaldi-thread.h TaskSequencer)
# ---------------------------------------------------------------------------


def test_map_ordered_preserves_order():
    import time

    from old_kaldi_git_tpu.utils.threads import map_ordered

    def slow_sq(x):
        time.sleep(0.02 * ((x * 7) % 3))  # jittered completion order
        return x * x

    got = list(map_ordered(slow_sq, range(40), num_threads=8))
    assert got == [x * x for x in range(40)]
    # degenerate single-thread path
    assert list(map_ordered(slow_sq, range(5), num_threads=1)) == [
        x * x for x in range(5)]


def test_map_ordered_propagates_errors():
    import pytest

    from old_kaldi_git_tpu.utils.threads import map_ordered

    def boom(x):
        if x == 3:
            raise ValueError("x=3")
        return x

    with pytest.raises(ValueError):
        list(map_ordered(boom, range(10), num_threads=4))


def test_task_sequencer_and_prefetch():
    from old_kaldi_git_tpu.utils.threads import TaskSequencer, prefetch

    with TaskSequencer(num_threads=4) as seq:
        for i in range(10):
            seq.submit(lambda x: x + 1, i)
        assert list(seq.results()) == list(range(1, 11))

    def gen():
        for i in range(100):
            yield i

    assert list(prefetch(gen(), depth=3)) == list(range(100))

    def bad_gen():
        yield 1
        raise RuntimeError("producer died")

    import pytest

    with pytest.raises(RuntimeError):
        list(prefetch(bad_gen()))


def test_lattice_determinize_cli_threads(tmp_path):
    """--num-threads output is byte-identical to single-threaded."""
    import math
    import os
    import subprocess
    import sys

    from old_kaldi_git_tpu.lat.lattice import Lattice, LatticeArc
    from old_kaldi_git_tpu.utils.table import TableWriter

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rngs = [1, 2, 3, 4, 5, 6]
    with TableWriter(f"ark:{tmp_path}/lat.ark", "lat") as w:
        for i in rngs:
            lat = Lattice()
            s0, s1, s2 = (lat.add_state(t) for t in (0, 1, 2))
            lat.start = s0
            lat.arcs[s0].append(LatticeArc(1, 10, 0.0, -math.log(0.5), s1))
            lat.arcs[s0].append(LatticeArc(2, 10, 0.0, -math.log(0.5), s1))
            lat.arcs[s1].append(LatticeArc(1, 20 + i, 0.0, 0.1 * i, s2))
            lat.finals[s2] = (0.0, 0.0)
            w[f"utt{i}"] = lat

    def run(extra, out):
        r = subprocess.run(
            [sys.executable, "-m", "old_kaldi_git_tpu.bin",
             "lattice-determinize"] + extra +
            [f"ark:{tmp_path}/lat.ark", f"ark:{tmp_path}/{out}"],
            capture_output=True, text=True,
            env={**os.environ, "PYTHONPATH": repo})
        assert r.returncode == 0, r.stderr

    run([], "c1.ark")
    run(["--num-threads=4"], "c4.ark")
    b1 = open(tmp_path / "c1.ark", "rb").read()
    b4 = open(tmp_path / "c4.ark", "rb").read()
    assert b1 == b4 and len(b1) > 0
