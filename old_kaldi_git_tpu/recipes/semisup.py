"""Semi-supervised chain (LF-MMI) training — the fork's specialty.

Reference parity: the fork's semi-supervised recipes
(egs/*/s5/local/semisup/chain/run_tdnn_*semisupervised*.sh +
steps/nnet3/chain/train_semisup-style drivers; Manohar et al. ICASSP 2018,
SURVEY.md §8.4 "semi-supervised nnet3 variants"):

1. train a seed chain model on the supervised subset;
2. decode the unlabeled audio with the seed model, keeping LATTICES;
3. use each decode lattice (LM scores scaled by --lattice-lm-scale) as the
   numerator supervision for that utterance (chain-supervision-splitter
   role, here chain/semisup.py lattice_to_numerator);
4. continue LF-MMI training on supervised + unsupervised utterances
   together, unsupervised sequences weighted by --unsup-egs-weight.

TPU formulation: one jitted step over the combined batch; supervised and
lattice numerators share the same padded arc-tensor format
(chain/e2e.py NumeratorGraphBatch), so the scan kernel does not branch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from old_kaldi_git_tpu.chain.e2e import (
    NumeratorGraphBatch,
    chain_e2e_loss,
    normalize_numerator_csr,
)
from old_kaldi_git_tpu.chain.loss import ChainLossOptions
from old_kaldi_git_tpu.chain.semisup import lattice_to_numerator
from old_kaldi_git_tpu.decoder.csr import CsrGraph
from old_kaldi_git_tpu.decoder.graph import GraphCompiler
from old_kaldi_git_tpu.decoder.viterbi import ViterbiOptions, decode_batch
from old_kaldi_git_tpu.fst.lang import Lang
from old_kaldi_git_tpu.lat.lattice import (
    Lattice,
    lattice_from_decode,
    lattice_prune,
)
from old_kaldi_git_tpu.models.am_nnet import AmNnet
from old_kaldi_git_tpu.models.train import (
    NnetTrainOptions,
    TrainState,
    make_optimizer,
)
from old_kaldi_git_tpu.models.tdnn import apply_orthonormal_constraints
from old_kaldi_git_tpu.recipes.chain import ChainModel
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger
from old_kaldi_git_tpu.utils.parse_options import options_dataclass

log = get_logger("semisup")


@options_dataclass
class SemisupOptions:
    """Knobs named after the reference recipe's flags."""

    num_epochs: int = 6
    minibatch_size: int = 8
    initial_lr: float = 3e-4
    final_lr: float = 5e-5
    # decode of the unlabeled data
    beam: float = 16.0
    max_active: int = 7000
    lattice_beam: float = 8.0
    lattice_prune_beam: float = 4.0  # recipe's --lattice-prune-beam
    # supervision weighting
    lattice_lm_scale: float = 0.5  # recipe's --lattice-lm-scale
    unsup_egs_weight: float = 1.0  # recipe's --unsup-egs-weight
    leaky_hmm_coefficient: float = 0.1
    l2_regularize: float = 5e-5
    seed: int = 0


def decode_chain_lattices(
    chain: ChainModel,
    graph: CsrGraph,
    feats: Dict[str, np.ndarray],
    beam: float = 16.0,
    max_active: int = 7000,
    lattice_beam: float = 8.0,
    acoustic_scale: float = 1.0,
) -> Dict[str, Lattice]:
    """Batched chain decode keeping raw (tid-level) lattices at the
    subsampled frame rate (nnet3-latgen-faster with a chain model)."""
    keys = sorted(feats)
    fsf = chain.frame_subsampling_factor
    T = max(feats[k].shape[0] for k in keys)
    T = ((T + fsf - 1) // fsf) * fsf
    D = feats[keys[0]].shape[1]
    padded = np.zeros((len(keys), T, D), np.float32)
    nf = np.zeros(len(keys), np.int32)
    for i, k in enumerate(keys):
        padded[i, : feats[k].shape[0]] = feats[k]
        nf[i] = (feats[k].shape[0] + fsf - 1) // fsf
    logits = np.asarray(
        chain.am.logits(jnp.asarray(padded), output_stride=fsf))
    results = decode_batch(
        graph, logits, nf,
        ViterbiOptions(beam=beam, max_active=max_active,
                       acoustic_scale=acoustic_scale),
        want_lattice=True,
    )
    lats: Dict[str, Lattice] = {}
    for i, (k, res) in enumerate(zip(keys, results)):
        if res is None or res.frame_states is None:
            log.warning("no lattice for unsupervised utt %s", k)
            continue
        lat = lattice_from_decode(
            graph, logits[i, : nf[i]], res.frame_states, res.frame_costs,
            acoustic_scale, lattice_beam,
        )
        if lat is not None:
            lats[k] = lat
    return lats


def train_chain_semisup(
    seed_model: ChainModel,
    lang: Lang,
    sup_feats: Dict[str, np.ndarray],
    sup_transcripts: Dict[str, Sequence[str]],
    unsup_feats: Dict[str, np.ndarray],
    decode_graph: CsrGraph,
    opts: Optional[SemisupOptions] = None,
) -> ChainModel:
    """Continue LF-MMI training of ``seed_model`` on supervised transcripts
    plus lattice-supervised unlabeled audio.  Tree, transition model, and
    denominator graph stay those of the seed (the reference recipe keeps the
    seed system's den graph; it optionally re-estimates the phone LM on the
    combined hypotheses — we keep the seed LM, which only makes num ≤ den
    easier to maintain)."""
    opts = opts or SemisupOptions()
    tm, den, fsf = (seed_model.tm, seed_model.den,
                    seed_model.frame_subsampling_factor)

    # 1. lattice supervision for the unlabeled data
    lats = decode_chain_lattices(
        seed_model, decode_graph, unsup_feats,
        beam=opts.beam, max_active=opts.max_active,
        lattice_beam=opts.lattice_beam,
    )
    unsup_keys = sorted(lats)
    pruned = {
        k: lattice_prune(lats[k], opts.lattice_prune_beam,
                         lm_scale=1.0, ac_scale=1.0)
        for k in unsup_keys
    }
    unsup_graphs = []
    kept_keys = []
    for k in unsup_keys:
        try:
            unsup_graphs.append(
                lattice_to_numerator(pruned[k], tm, den,
                                     lattice_lm_scale=opts.lattice_lm_scale))
            kept_keys.append(k)
        except KaldiError as e:
            # one bad lattice must not abort the whole semisup run
            log.warning("skipping unsupervised utterance %s: %s", k, e)
    unsup_keys = kept_keys

    # 2. transcript supervision for the labeled data (same numerator format)
    compiler = GraphCompiler(lang, seed_model.ctx_dep, tm)
    tid2pdf = tm.tid_to_pdf_array()
    sup_keys = sorted(k for k in sup_transcripts if k in sup_feats)
    sup_graphs = [
        normalize_numerator_csr(
            compiler.compile_csr_from_text(sup_transcripts[k]),
            tm, den)
        for k in sup_keys
    ]

    keys = sup_keys + unsup_keys
    gbatch = NumeratorGraphBatch.from_csr_graphs(sup_graphs + unsup_graphs)
    weights = np.concatenate([
        np.ones(len(sup_keys), np.float32),
        np.full(len(unsup_keys), opts.unsup_egs_weight, np.float32),
    ])
    feats_all = {**{k: sup_feats[k] for k in sup_keys},
                 **{k: unsup_feats[k] for k in unsup_keys}}
    input_dim = next(iter(feats_all.values())).shape[1]
    Tfull = max(feats_all[k].shape[0] for k in keys)
    Tfull = ((Tfull + fsf - 1) // fsf) * fsf
    feats_padded = np.zeros((len(keys), Tfull, input_dim), np.float32)
    nf_sub = np.zeros(len(keys), np.int32)
    for i, k in enumerate(keys):
        t = feats_all[k].shape[0]
        feats_padded[i, :t] = feats_all[k]
        nf_sub[i] = (t + fsf - 1) // fsf
    log.info(
        "semisup: %d supervised + %d lattice-supervised utts, numerators "
        "≤%d states/%d arcs", len(sup_keys), len(unsup_keys),
        gbatch.num_states, gbatch.src.shape[1],
    )

    # 3. continue training the seed parameters
    am = seed_model.am
    model = am.model()
    loss_opts = ChainLossOptions(
        leaky_hmm_coefficient=opts.leaky_hmm_coefficient,
        l2_regularize=opts.l2_regularize, xent_regularize=0.0,
    )
    num_steps = opts.num_epochs * max(1, len(keys) // opts.minibatch_size)
    optimizer = make_optimizer(
        NnetTrainOptions(initial_lr=opts.initial_lr,
                         final_lr=opts.final_lr), num_steps)
    params = am.variables["params"]
    state = TrainState(params, am.variables.get("batch_stats", {}),
                       optimizer.init(params), 0)

    def loss_fn(params, batch_stats, bf, b_nf, bg, b_wt, dropout_rng):
        logits_sub, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, bf, train=True,
            dropout_rng=dropout_rng, mutable=["batch_stats"],
            output_stride=fsf,
        )
        logits = logits_sub
        loss, metrics = chain_e2e_loss(
            logits, den, bg, b_nf, loss_opts, seq_weights=b_wt)
        return loss, (mutated["batch_stats"], metrics)

    @jax.jit
    def step_fn(state, bf, b_nf, b_wt, b_src, b_dst, b_pdf, b_w, b_m,
                b_init, b_final):
        bg = NumeratorGraphBatch(b_src, b_dst, b_pdf, b_w, b_m, b_init,
                                 b_final)
        rng = jax.random.fold_in(jax.random.PRNGKey(1), state.step)
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, bf, b_nf, bg, b_wt, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(new_params, new_bs, new_opt, state.step + 1),
                loss, metrics)

    rng = np.random.default_rng(opts.seed)
    order = np.arange(len(keys))
    B = opts.minibatch_size
    for epoch in range(opts.num_epochs):
        rng.shuffle(order)
        objs: List[float] = []
        batches = [order[i: i + B] for i in range(0, len(order) - B + 1, B)]
        if not batches:
            batches = [order]
        for idx in batches:
            state, loss, metrics = step_fn(
                state, feats_padded[idx], nf_sub[idx], weights[idx],
                gbatch.src[idx], gbatch.dst[idx], gbatch.pdf[idx],
                gbatch.weight[idx], gbatch.mask[idx], gbatch.init_lp[idx],
                gbatch.final_lp[idx],
            )
            objs.append(float(metrics["objf"]))
            if state.step % 4 == 0:
                state = TrainState(
                    apply_orthonormal_constraints(state.params),
                    state.batch_stats, state.opt_state, state.step,
                )
        log.info("semisup epoch %d: objf %.4f (%d steps)",
                 epoch, float(np.mean(objs)) if objs else float("nan"),
                 len(objs))
    out_am = AmNnet(
        am.config,
        {"params": jax.tree.map(np.asarray, state.params),
         "batch_stats": jax.tree.map(np.asarray, state.batch_stats)},
        None,
    )
    return ChainModel(out_am, seed_model.ctx_dep, tm, den, fsf)
