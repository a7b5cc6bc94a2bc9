"""iVector extractor + scaling-harness tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from old_kaldi_git_tpu.ivector import (
    extract_ivector,
    train_ivector_extractor,
    train_ubm,
)
from old_kaldi_git_tpu.ivector.extractor import extract_ivectors_per_spk
from old_kaldi_git_tpu.parallel.scaling import measure_scaling


def _speaker_corpus(num_spk=4, utts_per_spk=6, frames=200, dim=10, seed=0):
    """Frames come from shared 'phonetic' clusters; each speaker adds a
    small global offset in a 2-D subspace — the i-vector modeling
    assumption (UBM captures phonetic variability, speakers shift means)."""
    rng = np.random.default_rng(seed)
    num_clusters = 6
    clusters = rng.standard_normal((num_clusters, dim)) * 4.0
    basis = rng.standard_normal((2, dim))
    basis /= np.linalg.norm(basis, axis=1, keepdims=True)
    spk_w = rng.standard_normal((num_spk, 2))
    feats, labels = {}, {}
    for s in range(num_spk):
        offset = 0.8 * spk_w[s] @ basis
        for u in range(utts_per_spk):
            key = f"s{s}_u{u}"
            which = rng.integers(0, num_clusters, size=frames)
            feats[key] = (
                clusters[which] + offset + 0.7 * rng.standard_normal((frames, dim))
            ).astype(np.float32)
            labels[key] = s
    return feats, labels


def test_ubm_em_increases_likelihood():
    rng = np.random.default_rng(1)
    x = np.concatenate(
        [rng.normal(-2, 1, (300, 5)), rng.normal(3, 0.5, (300, 5))]
    )
    ubm = train_ubm(x, num_gauss=4, num_iters=6)
    assert ubm.num_mix == 4
    # the two clusters should be represented among the means
    d = np.abs(ubm.means[:, 0][:, None] - np.array([[-2.0, 3.0]]))
    assert d.min(axis=0).max() < 0.5


def test_ivectors_separate_speakers():
    feats, labels = _speaker_corpus()
    pooled = np.concatenate(list(feats.values()))
    ubm = train_ubm(pooled, num_gauss=8, num_iters=5)
    ext = train_ivector_extractor(ubm, list(feats.values()), ivector_dim=4,
                                  num_iters=4)
    ivs = {k: extract_ivector(ext, v) for k, v in feats.items()}
    keys = sorted(ivs)
    same, diff = [], []
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            dist = float(np.linalg.norm(ivs[a] - ivs[b]))
            (same if labels[a] == labels[b] else diff).append(dist)
    assert np.mean(same) < 0.6 * np.mean(diff), (
        f"same {np.mean(same):.3f} vs diff {np.mean(diff):.3f}"
    )
    # per-speaker pooled extraction groups utterances
    spk_ivs = extract_ivectors_per_spk(
        ext, feats, {k: f"spk{labels[k]}" for k in feats}
    )
    assert len(spk_ivs) == 4


def test_scaling_harness_virtual_devices():
    """Data-parallel matmul step scales across virtual CPU devices without
    error; efficiency is reported (CPU gives no real speedup — we check the
    plumbing, not the number)."""

    def make_step(mesh):
        @jax.jit
        def step(batch):
            x = batch["x"]
            return jnp.sum(jnp.tanh(x @ x.transpose(0, 2, 1)))

        return step

    def make_batch(n):
        rng = np.random.default_rng(0)
        return {"x": rng.standard_normal((4 * n, 64, 64)).astype(np.float32)}

    points = measure_scaling(
        make_step, make_batch, device_counts=[1, 2, 4, 8],
        work_per_batch=4.0, iters=3,
    )
    assert [p.num_devices for p in points] == [1, 2, 4, 8]
    assert points[0].efficiency == pytest.approx(1.0)
    assert all(p.throughput > 0 for p in points)


def test_decode_batch_sharded_over_mesh():
    """P9: batched decode partitions over the data axis of a device mesh —
    sharded input produces identical results to single-device decode."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
    from tests.test_lattice import _decode_system, _fake_loglikes

    lang, topo, cd, tm, csr = _decode_system()
    phones = [lang.phones[p] for p in ("Y", "EH", "S")]
    ll_one = _fake_loglikes(tm, cd, lang, phones, sep=3.0)
    T = ll_one.shape[0]
    B = 8
    ll = np.broadcast_to(ll_one[None], (B, T, ll_one.shape[1])).copy()
    nf = [T] * B
    vopts = ViterbiOptions(beam=30.0, max_active=100, acoustic_scale=1.0)

    base = decode_batch(csr, ll, nf, vopts)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    ll_sharded = jax.device_put(
        jnp.asarray(ll), NamedSharding(mesh, P("data"))
    )
    sharded = decode_batch(csr, ll_sharded, nf, vopts)
    for rb, rs in zip(base, sharded):
        assert rb is not None and rs is not None
        assert rb.words == rs.words
        assert np.array_equal(rb.alignment, rs.alignment)
        assert abs(rb.cost - rs.cost) < 1e-3


def test_online_ivectors_and_append():
    """Online i-vectors converge toward the whole-utterance i-vector and
    append_ivectors produces the chain recipes' input shape."""
    from old_kaldi_git_tpu.ivector.extractor import (
        append_ivectors,
        extract_ivector,
        extract_online_ivectors,
        train_ivector_extractor,
        train_ubm,
    )

    rng = np.random.default_rng(0)
    # two "speakers" with shifted feature means
    utts = {}
    for s in range(2):
        for i in range(4):
            utts[f"s{s}u{i}"] = (
                rng.normal(size=(60, 5)) + 3.0 * s
            ).astype(np.float32)
    ubm = train_ubm(np.concatenate(list(utts.values())), num_gauss=4,
                    num_iters=3)
    ext = train_ivector_extractor(ubm, list(utts.values()), ivector_dim=3,
                                  num_iters=3)
    x = utts["s1u0"]
    online = extract_online_ivectors(ext, x, period=10)
    assert online.shape == (60, 3)
    whole = extract_ivector(ext, x)
    # piecewise-constant per period; last estimate uses all stats = whole-utt
    assert np.allclose(online[-1], whole, atol=1e-4)
    assert np.allclose(online[0], online[9])
    # early estimates differ from the final (it adapts over time)
    assert np.abs(online[0] - online[-1]).max() > 1e-6

    both = append_ivectors(utts, ext, period=10)
    assert both["s0u0"].shape == (60, 8)
    np.testing.assert_allclose(both["s1u0"][:, :5], x, atol=1e-6)
