"""Streaming feature extraction and decoding.

Parity with reference src/online2 + src/feat/online-feature.h:

  OnlineFeaturePipeline   ~ OnlineNnet2FeaturePipeline: accept_waveform()
                            buffers samples, emits feature frames as soon as
                            they are final.  Deltas (±4 frames) and centered
                            sliding CMVN introduce bounded lookahead latency;
                            streaming output == batch output exactly (tested,
                            the reference's online-feature-test oracle).
  StreamingDecoder        ~ SingleUtteranceNnet3Decoder + LatticeFasterOnline
                            Decoder::AdvanceDecoding: chunked AM evaluation
                            with receptive-field context re-computation,
                            carried dense beam state (alpha [S]) across
                            chunks, incremental best path, endpointing.
  EndpointRule            ~ online-endpoint.h OnlineEndpointRule.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from old_kaldi_git_tpu.decoder.csr import CsrGraph
from old_kaldi_git_tpu.decoder.viterbi import (
    BIG,
    ViterbiOptions,
    _backtrace_scan,
    _decode_scan_impl,
)


@partial(jax.jit, static_argnames=("K", "S", "Tc"), donate_argnums=(5, 6))
def _chunk_update(frm, pdf, w, ns, alpha, bps_buf, bpa_buf, ll, t0, nvalid,
                  acoustic_scale, beam, K, S, Tc):
    """One streaming chunk, fully on-device: advance the dense beam state
    and append the chunk's [Tc, 1, K] backpointers into the preallocated
    device buffers (donated → updated in place).  Nothing but the [1, K]
    token set ever crosses the device link per chunk; the full backtrace
    stays on device until results are requested (the offline fused path's
    'backpointers never leave the device' rule applied to streaming)."""
    tok_state, tok_cost, bp_s, bp_a, _bp_c, alpha2 = _decode_scan_impl(
        frm, pdf, w, ns, alpha, ll, nvalid, acoustic_scale, beam, K, S
    )
    bps_buf = jax.lax.dynamic_update_slice(bps_buf, bp_s, (t0, 0, 0))
    bpa_buf = jax.lax.dynamic_update_slice(bpa_buf, bp_a, (t0, 0, 0))
    return alpha2, tok_state, tok_cost, bps_buf, bpa_buf
from old_kaldi_git_tpu.feat.compute import Mfcc, MfccOptions
from old_kaldi_git_tpu.feat.functions import DeltaFeaturesOptions, compute_deltas
from old_kaldi_git_tpu.feat.window import num_frames as count_frames
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("online")


class OnlineFeaturePipeline:
    """Streaming MFCC (+ optional deltas, causal mean normalization)."""

    def __init__(
        self,
        mfcc_opts: Optional[MfccOptions] = None,
        add_deltas: bool = True,
        cmn_window: int = 600,
        global_cmvn_stats: Optional[np.ndarray] = None,
        cmn_min_frames: int = 100,
        ivector_extractor=None,
    ):
        """global_cmvn_stats [2, D+1] (feat.cmvn layout) primes the causal
        mean while fewer than cmn_min_frames have been seen (reference
        OnlineCmvn global-stats smoothing).

        ivector_extractor: an ivector.extractor.OnlineIvectorExtractor fed
        the pipeline's own output frames; each emitted frame comes back
        with its online i-vector appended (reference
        OnlineNnet2FeaturePipeline's ivector_feature_ branch).  Frames are
        additionally held back until their i-vector period completes
        (≤ period−1 frames), so for any chunking the appended i-vectors
        equal extract_online_ivectors over the whole stream exactly."""
        self.mfcc = Mfcc(mfcc_opts or MfccOptions())
        self.add_deltas = add_deltas
        self.cmn_window = cmn_window
        self.cmn_min_frames = cmn_min_frames
        self._iv = ivector_extractor
        self._iv_pending: Optional[np.ndarray] = None  # frames awaiting ivecs
        if global_cmvn_stats is not None:
            st = np.asarray(global_cmvn_stats, np.float64)
            self.global_mean = st[0, :-1] / max(st[0, -1], 1e-10)
        else:
            self.global_mean = None
        self.delta_ctx = 4 if add_deltas else 0  # ±(order*window) lookahead
        self._samples = np.zeros(0, np.float32)
        self._raw_frames: Optional[np.ndarray] = None  # [n, 13] raw cepstra
        self._emitted = 0
        self.finished = False

    def accept_waveform(self, samples: np.ndarray) -> np.ndarray:
        """Returns newly finalized output frames [n_new, D]."""
        self._samples = np.concatenate([self._samples, np.asarray(samples, np.float32)])
        return self._advance()

    def input_finished(self) -> np.ndarray:
        self.finished = True
        return self._advance()

    def _advance(self) -> np.ndarray:
        n_ready = count_frames(len(self._samples), self.mfcc.frame_opts)
        have = 0 if self._raw_frames is None else len(self._raw_frames)
        if n_ready > have:
            # compute only the new frames (window positions are absolute)
            feats = np.asarray(self.mfcc(jnp.asarray(self._samples)))
            self._raw_frames = feats
        total = 0 if self._raw_frames is None else len(self._raw_frames)
        # a frame is final once its delta lookahead exists (or input ended)
        final_until = total if self.finished else max(0, total - self.delta_ctx)
        if final_until <= self._emitted:
            out = np.zeros((0, self.base_dim), np.float32)
        else:
            out = self._process(self._raw_frames, self._emitted, final_until)
            self._emitted = final_until
        if self._iv is None:
            return out
        return self._append_ivectors(out)

    def _append_ivectors(self, out_new: np.ndarray) -> np.ndarray:
        """Feed the newly-final base frames to the online extractor (each
        frame exactly once; the extractor buffers partial periods), queue
        frames whose i-vector isn't final yet, and emit
        [n, base_dim + ivec_dim] for those whose period completed."""
        ivs = self._iv.accept(out_new)
        if self.finished:
            tail = self._iv.input_finished()
            ivs = np.concatenate([ivs, tail]) if ivs.size else tail
        queue = out_new
        if self._iv_pending is not None and self._iv_pending.size:
            queue = (np.concatenate([self._iv_pending, out_new])
                     if out_new.size else self._iv_pending)
        self._iv_pending = None
        n = len(ivs)  # always ≤ len(queue): ivectors come back in order
        ready, self._iv_pending = queue[:n], queue[n:]
        if n == 0:
            return np.zeros((0, self.output_dim), np.float32)
        return np.concatenate([ready, ivs], axis=1).astype(np.float32)

    @property
    def base_dim(self) -> int:
        return self.mfcc.dim * (3 if self.add_deltas else 1)

    @property
    def output_dim(self) -> int:
        return self.base_dim + (self._iv.ivector_dim if self._iv else 0)

    def _causal_mean(self, raw: np.ndarray, t: int) -> np.ndarray:
        """Mean over up to cmn_window frames ending at t, padded with the
        global mean while fewer than cmn_min_frames are available
        (reference OnlineCmvn smoothing)."""
        lo = max(0, t + 1 - self.cmn_window)
        count = t + 1 - lo
        s = raw[lo : t + 1].sum(axis=0)
        if self.global_mean is not None and count < self.cmn_min_frames:
            deficit = self.cmn_min_frames - count
            s = s + deficit * self.global_mean
            count = self.cmn_min_frames
        return s / count

    def _process(self, raw: np.ndarray, start: int, end: int) -> np.ndarray:
        """Causal mean normalization + deltas for frames [start, end)."""
        out_rows = [raw[t] - self._causal_mean(raw, t) for t in range(start, end)]
        norm = np.stack(out_rows) if out_rows else np.zeros((0, raw.shape[1]))
        if not self.add_deltas:
            return norm.astype(np.float32)
        # deltas need context: normalize the needed neighborhood causally too
        ctx_lo = max(0, start - self.delta_ctx)
        ctx_hi = min(len(raw), end + self.delta_ctx)
        ctx_rows = [raw[t] - self._causal_mean(raw, t) for t in range(ctx_lo, ctx_hi)]
        ctx = np.stack(ctx_rows)
        # replicate edges exactly like the batch path when at stream edges
        deltas = np.asarray(compute_deltas(jnp.asarray(ctx[None]))[0])
        return deltas[start - ctx_lo : end - ctx_lo].astype(np.float32)


@dataclasses.dataclass
class EndpointRule:
    """reference OnlineEndpointRule."""

    must_contain_nonsilence: bool = True
    min_trailing_silence: float = 1.0  # seconds
    min_utterance_length: float = 0.0

    def triggered(self, utt_sec: float, trailing_sil_sec: float,
                  said_something: bool) -> bool:
        if self.must_contain_nonsilence and not said_something:
            return False
        return (
            trailing_sil_sec >= self.min_trailing_silence
            and utt_sec >= self.min_utterance_length
        )


def default_endpoint_rules() -> List[EndpointRule]:
    """reference default rules 1/2/5 (simplified set)."""
    return [
        EndpointRule(False, 5.0, 0.0),   # long silence, nothing said
        EndpointRule(True, 1.0, 0.0),    # said something, 1s silence
        EndpointRule(True, 0.0, 20.0),   # hard cap on utterance length
    ]


@partial(jax.jit, donate_argnums=(2, 3))
def _append_bp(bp_s_chunk, bp_a_chunk, bps_buf, bpa_buf, t0):
    """Append a chunk's [Tc, 1, K] backpointers into the persistent
    device buffers (donated → updated in place)."""
    bps_buf = jax.lax.dynamic_update_slice(bps_buf, bp_s_chunk, (t0, 0, 0))
    bpa_buf = jax.lax.dynamic_update_slice(bpa_buf, bp_a_chunk, (t0, 0, 0))
    return bps_buf, bpa_buf


class StreamingTokenDecoder:
    """Streaming decode over HUGE graphs: the token-sparse kernel
    (viterbi._decode_scan_tokens) run chunk-wise with the [1, K] token
    set carried across chunks — per-frame work independent of graph
    size, so million-state HCLGs stream on one chip (the dense
    StreamingDecoder's [1, S] alpha + all-arc relax does not scale past
    ~10^5 states).  Same contract as StreamingDecoder: feed finalized
    loglike frames via advance(), read best_words()/endpoint_detected().

    ~ reference SingleUtteranceNnet3Decoder::AdvanceDecoding over
    LatticeFasterOnlineDecoder, re-shaped per SURVEY §3.5: carried
    (NN-state, beam-state) with host-side chunk feed."""

    def __init__(
        self,
        graph: CsrGraph,
        am_loglikes_fn,
        silence_phones: Sequence[int],
        tid_to_phone: np.ndarray,
        opts: Optional[ViterbiOptions] = None,
        frame_shift: float = 0.01,
        am_left_context: int = 0,
        am_right_context: int = 0,
        endpoint_rules: Optional[List[EndpointRule]] = None,
        max_frames: int = 6000,
        chunk_quantum: int = 32,
        frame_subsampling_factor: int = 1,
    ):
        """frame_subsampling_factor > 1 streams a CHAIN model (reference
        online2 decoding of chain systems): features are fed at the
        input rate, am_loglikes_fn maps the [1, W, D] window to
        [1, W/fsf, P] subsampled loglikes (AmNnet.logits with
        output_stride), and the search advances one graph frame per fsf
        input frames over the self-loop-scale-1.0 split-eps graph.
        Split-eps graphs are supported directly: the per-frame backoff
        hop merge and the eps-closure seeding match the batch kernel
        (viterbi._decode_scan_tokens), so streaming == batch stays exact.
        """
        from old_kaldi_git_tpu.decoder.viterbi import (
            _decode_scan_tokens,
            _eps_hop_table,
            _token_budget,
        )

        self.graph = graph
        self.am = am_loglikes_fn
        self.opts = opts or ViterbiOptions()
        self.silence_phones = set(int(p) for p in silence_phones)
        self.tid_to_phone = tid_to_phone
        self.fsf = int(frame_subsampling_factor)
        if self.fsf < 1:
            raise KaldiError("frame_subsampling_factor must be >= 1")
        if chunk_quantum % self.fsf:
            raise KaldiError(
                "chunk_quantum must be a multiple of "
                "frame_subsampling_factor (chunks advance whole "
                "subsampled frames)")
        # endpointing clocks in INPUT seconds; search frames cover fsf
        # input frames each
        self.frame_shift = frame_shift * self.fsf
        # left context rounded up to the subsample grid so the AM
        # window's stride phase matches the batch evaluation exactly
        self.lctx = -(-am_left_context // self.fsf) * self.fsf
        self.rctx = am_right_context
        self.rules = endpoint_rules or default_endpoint_rules()
        from old_kaldi_git_tpu.decoder.csr import build_tile_graph

        self.K = max(4, min(self.opts.max_active, graph.num_states))
        tg = build_tile_graph(graph)
        self._tg = tg
        self.E = _token_budget(graph, self.K, tg.md)  # tile budget ET
        self.max_frames = max_frames
        self.chunk_quantum = chunk_quantum
        self._scan = _decode_scan_tokens
        self._tile_ptr = jnp.asarray(tg.tile_ptr)
        self._tiles = jnp.asarray(tg.tiles)
        self._frm = jnp.asarray(tg.frm_pad)
        self._fw = np.where(
            np.isfinite(graph.final_weight), graph.final_weight, BIG)
        self._eps_hops, self._D = (None, 0)
        self._seeds = [(graph.start, 0.0)]
        if graph.eps_ns is not None:
            self._eps_hops, self._D = _eps_hop_table(graph)
            # start state's eps closure seeds the initial token set (the
            # kernel's hop merge only runs after each frame's expansion)
            u, c = graph.start, 0.0
            while graph.eps_ns[u] >= 0 and len(self._seeds) <= self._D:
                c += float(graph.eps_w[u])
                u = int(graph.eps_ns[u])
                self._seeds.append((u, c))
        # AM window: fixed length so every chunk hits one compiled
        # program; a multiple of 16·fsf keeps the subsample grid aligned
        self._W = (-(-(self.lctx + chunk_quantum + self.rctx)
                     // (16 * self.fsf)) * 16 * self.fsf)
        self._fused = self._build_fused()
        self.reset()

    def _build_fused(self):
        """ONE jitted program per chunk: AM forward over the fixed context
        window → slice the chunk's loglikes → token-sparse frame updates
        with the carried [1, K] token set → append backpointers into the
        donated device buffers.  A single tunnel dispatch per chunk (the
        3-dispatch version measured RTF 2.3 on the tunneled chip; dispatch
        latency, not compute, dominates single-stream streaming there)."""
        am = self.am
        scan = self._scan
        qs = self.chunk_quantum // self.fsf  # search frames per chunk
        K, E, S = self.K, self.E, self.graph.num_states
        start = self.graph.start
        ac = float(self.opts.acoustic_scale)
        beam = float(self.opts.beam)
        tile_ptr, tiles = self._tile_ptr, self._tiles
        eps_hops, D = self._eps_hops, self._D

        @partial(jax.jit, donate_argnums=(4, 5, 6, 7))
        def fused(feat_ctx, t_off, n_valid, t0, tok_state, tok_cost,
                  bps, bpa):
            ll = am(feat_ctx)[0]  # [W/fsf, P] (subsampled for chain)
            P = ll.shape[1]
            ll_new = jax.lax.dynamic_slice(ll, (t_off, 0), (qs, P))[None]
            out = scan(tile_ptr, tiles, start, ll_new,
                       jnp.reshape(n_valid, (1,)).astype(jnp.int32),
                       ac, beam, K, E, S, 0, 0.0, (tok_state, tok_cost),
                       eps_hops, D)
            ts, tc, bp_s, bp_a = out[0], out[1], out[2], out[3]
            bps = jax.lax.dynamic_update_slice(bps, bp_s, (t0, 0, 0))
            bpa = jax.lax.dynamic_update_slice(bpa, bp_a, (t0, 0, 0))
            return ts, tc, bps, bpa

        return fused

    def reset(self) -> None:
        ts0 = np.full((1, self.K), -1, np.int32)
        tc0 = np.full((1, self.K), BIG, np.float32)
        for i, (s_i, c_i) in enumerate(self._seeds[: self.K]):
            ts0[:, i] = s_i
            tc0[:, i] = c_i
        self._tok_state = jnp.asarray(ts0)
        self._tok_cost = jnp.asarray(tc0)
        self._feat_buf = np.zeros((0, 0), np.float32)
        self._frames_decoded = 0
        rows = -(-self.max_frames // self.fsf)
        self._bps_buf = jnp.full((rows, 1, self.K), -1, jnp.int32)
        self._bpa_buf = jnp.full((rows, 1, self.K), -1, jnp.int32)

    def advance(self, new_feats: np.ndarray, final: bool = False) -> None:
        """Feed newly finalized feature frames (same hold-back contract as
        StreamingDecoder.advance)."""
        if new_feats.size != 0:
            if self._feat_buf.size == 0:
                self._feat_buf = new_feats.copy()
            else:
                self._feat_buf = np.concatenate([self._feat_buf, new_feats])
        avail = len(self._feat_buf) if self._feat_buf.size else 0
        total = avail if final else max(
            self._frames_decoded, avail - self.rctx)
        if not final:
            # only advance whole subsampled frames mid-stream so the AM
            # window's stride phase stays aligned with the batch path
            total = (self._frames_decoded
                     + ((total - self._frames_decoded) // self.fsf)
                     * self.fsf)
        n_new = total - self._frames_decoded
        if n_new <= 0:
            return
        q = self.chunk_quantum
        if total + q > self.max_frames:
            # dynamic_update_slice clamps the START index when the slice
            # would overhang — that would silently corrupt earlier rows
            raise ValueError(
                f"stream + chunk padding exceeds max_frames="
                f"{self.max_frames}; raise it or endpoint/reset")
        # process in quantum-sized sub-chunks, ONE fused dispatch each
        while n_new > 0:
            take = min(q, n_new)
            fd = self._frames_decoded
            lo = max(0, fd - self.lctx)
            window = self._feat_buf[lo:avail]
            # fixed-length window, edge-replication pad (identical to the
            # clip-splice edge semantics → outputs for kept frames are
            # bit-identical to the batch path); one compiled program total
            if len(window) < self._W:
                window = np.pad(
                    window, ((0, self._W - len(window)), (0, 0)),
                    mode="edge")
            else:
                window = window[: self._W]
            (self._tok_state, self._tok_cost, self._bps_buf,
             self._bpa_buf) = self._fused(
                jnp.asarray(window[None]), (fd - lo) // self.fsf,
                -(-take // self.fsf), fd // self.fsf,
                self._tok_state, self._tok_cost,
                self._bps_buf, self._bpa_buf)
            self._frames_decoded = fd + take
            n_new -= take

    # -- results (same device-side backtrace as StreamingDecoder) ----------
    def _backtrace(self) -> Tuple[List[int], List[int]]:
        if self._frames_decoded == 0:
            return [], []
        nf_s = -(-self._frames_decoded // self.fsf)  # search frames
        tok_state = np.asarray(self._tok_state)[0]
        tok_cost = np.asarray(self._tok_cost)[0]
        cb = np.where(tok_state >= 0, tok_cost, BIG)
        total = cb + self._fw[np.maximum(tok_state, 0)]
        use_final = bool(total.min() < BIG)
        if not use_final:
            total = cb
        slot = int(np.argmin(total))
        state = int(tok_state[slot])
        if state < 0:
            return [], []
        arcs = np.asarray(
            _backtrace_scan(
                self._bps_buf, self._bpa_buf, self._frm,
                jnp.asarray([state], np.int32),
                jnp.asarray([nf_s], np.int32),
            )
        )[:nf_s, 0]
        if (arcs < 0).any():
            return [], []
        # padded tile-slot ids -> original graph arc ids
        arcs = self._tg.pad2orig[arcs]
        if self.graph.eps_ns is not None:
            from old_kaldi_git_tpu.decoder.viterbi import (
                split_words_for_arc_seq,
            )

            words = split_words_for_arc_seq(self.graph, arcs, state)
            if words is None:
                return [], []
        else:
            words = []
            for a in arcs:
                words.extend(self.graph.arc_olabels[a])
        if use_final:
            words = words + list(self.graph.final_olabels[state])
        tids = [int(self.graph.tid[a]) for a in arcs]
        return words, tids

    def best_words(self) -> List[int]:
        return self._backtrace()[0]

    def trailing_silence_frames(self) -> int:
        _, tids = self._backtrace()
        n = 0
        for tid in reversed(tids):
            if int(self.tid_to_phone[tid]) in self.silence_phones:
                n += 1
            else:
                break
        return n

    def endpoint_detected(self) -> bool:
        words, tids = self._backtrace()
        utt_sec = self._frames_decoded * self.frame_shift
        sil_sec = self.trailing_silence_frames() * self.frame_shift
        said = len(words) > 0
        return any(r.triggered(utt_sec, sil_sec, said) for r in self.rules)


class StreamingDecoder:
    """Chunked decoding with carried beam state over a shared HCLG."""

    def __init__(
        self,
        graph: CsrGraph,
        am_loglikes_fn,
        silence_phones: Sequence[int],
        tid_to_phone: np.ndarray,
        opts: Optional[ViterbiOptions] = None,
        frame_shift: float = 0.01,
        am_left_context: int = 0,
        am_right_context: int = 0,
        endpoint_rules: Optional[List[EndpointRule]] = None,
        max_frames: int = 6000,
        chunk_quantum: int = 32,
    ):
        self.graph = graph
        self.am = am_loglikes_fn  # [1, T, D] feats → [1, T, P] loglikes
        self.opts = opts or ViterbiOptions()
        self.silence_phones = set(int(p) for p in silence_phones)
        self.tid_to_phone = tid_to_phone
        self.frame_shift = frame_shift
        self.lctx = am_left_context
        self.rctx = am_right_context
        self.rules = endpoint_rules or default_endpoint_rules()

        self.K = max(4, min(self.opts.max_active, graph.num_states))
        self.max_frames = max_frames
        self.chunk_quantum = chunk_quantum
        self._frm = jnp.asarray(
            np.repeat(np.arange(graph.num_states, dtype=np.int32), graph.out_degree())
        )
        self._pdf = jnp.asarray(graph.pdf)
        self._w = jnp.asarray(graph.weight)
        self._ns = jnp.asarray(graph.nextstate)
        self._fw = np.where(np.isfinite(graph.final_weight), graph.final_weight, BIG)
        self.reset()

    def reset(self) -> None:
        S = self.graph.num_states
        self.alpha = (
            jnp.full((1, S), BIG, jnp.float32).at[:, self.graph.start].set(0.0)
        )
        self._feat_buf = np.zeros((0, 0), np.float32)
        self._frames_decoded = 0
        # device-resident backpointer buffers: appended to in place inside
        # the jitted chunk update, read only by the on-device backtrace
        self._bps_buf = jnp.full((self.max_frames, 1, self.K), -1, jnp.int32)
        self._bpa_buf = jnp.full((self.max_frames, 1, self.K), -1, jnp.int32)
        self._last_tokens = None

    def advance(self, new_feats: np.ndarray, final: bool = False) -> None:
        """Feed newly finalized feature frames; decodes them chunk-wise with
        AM receptive-field context re-evaluated at chunk edges.  Chunks are
        padded up to a multiple of chunk_quantum so the jitted chunk program
        compiles once; only the [1, K] token set crosses the device link.

        The last `am_right_context` frames are HELD BACK until more audio
        (or final=True) arrives, so every decoded frame's loglikes were
        computed with full right context — the reference's online decodable
        does the same by reporting fewer NumFramesReady than feature frames.
        """
        if new_feats.size != 0:
            if self._feat_buf.size == 0:
                self._feat_buf = new_feats.copy()
            else:
                self._feat_buf = np.concatenate([self._feat_buf, new_feats])
        avail = len(self._feat_buf) if self._feat_buf.size else 0
        total = avail if final else max(self._frames_decoded, avail - self.rctx)
        n_new = total - self._frames_decoded
        if n_new <= 0:
            return
        if total > self.max_frames:
            raise ValueError(
                f"stream exceeds max_frames={self.max_frames}; raise it or "
                "endpoint/reset the utterance"
            )
        # AM context window covers held-back future frames too (right ctx)
        lo = max(0, self._frames_decoded - self.lctx)
        ctx_feats = self._feat_buf[lo:avail]
        # bucket the AM input length (edge-replication pad: identical to
        # the clip-splice edge semantics, so outputs for the kept frames
        # are bit-identical) — otherwise every distinct chunk length
        # compiles a fresh AM program, ruinous on the tunneled backend
        n_ctx = len(ctx_feats)
        n_pad = -(-max(n_ctx, 1) // 16) * 16 - n_ctx
        if n_pad:
            ctx_feats = np.pad(ctx_feats, ((0, n_pad), (0, 0)), mode="edge")
        ll = np.asarray(self.am(jnp.asarray(ctx_feats[None])))[0][:n_ctx]
        ll_new = ll[self._frames_decoded - lo :][:n_new]
        T = ll_new.shape[0]
        q = self.chunk_quantum
        Tc = (T + q - 1) // q * q
        ll_pad = np.zeros((1, Tc, ll_new.shape[1]), np.float32)
        ll_pad[0, :T] = ll_new
        alpha, tok_state, tok_cost, self._bps_buf, self._bpa_buf = (
            _chunk_update(
                self._frm, self._pdf, self._w, self._ns, self.alpha,
                self._bps_buf, self._bpa_buf, jnp.asarray(ll_pad),
                self._frames_decoded, jnp.asarray([T], jnp.int32),
                float(self.opts.acoustic_scale), float(self.opts.beam),
                self.K, self.graph.num_states, Tc,
            )
        )
        self.alpha = alpha
        self._last_tokens = (np.asarray(tok_state)[0], np.asarray(tok_cost)[0])
        self._frames_decoded = total

    # -- results ---------------------------------------------------------------
    def _backtrace(self) -> Tuple[List[int], List[int]]:
        """(words, tids) of the current best path (backtrace on device;
        transfers [max_frames] arc ids)."""
        if self._frames_decoded == 0:
            return [], []
        tok_state, tok_cost = self._last_tokens
        total = tok_cost + self._fw[tok_state]
        if total.min() >= BIG:
            total = tok_cost
        slot = int(np.argmin(total))
        state = int(tok_state[slot])
        arcs = np.asarray(
            _backtrace_scan(
                self._bps_buf, self._bpa_buf, self._frm,
                jnp.asarray([state], np.int32),
                jnp.asarray([self._frames_decoded], np.int32),
            )
        )[: self._frames_decoded, 0]
        if (arcs < 0).any():
            return [], []
        words: List[int] = []
        for a in arcs:
            words.extend(self.graph.arc_olabels[a])
        tids = [int(self.graph.tid[a]) for a in arcs]
        return words, tids

    def best_words(self) -> List[int]:
        return self._backtrace()[0]

    def trailing_silence_frames(self) -> int:
        _, tids = self._backtrace()
        n = 0
        for tid in reversed(tids):
            if int(self.tid_to_phone[tid]) in self.silence_phones:
                n += 1
            else:
                break
        return n

    def endpoint_detected(self) -> bool:
        words, tids = self._backtrace()
        utt_sec = self._frames_decoded * self.frame_shift
        sil_sec = self.trailing_silence_frames() * self.frame_shift
        said = len(words) > 0
        return any(r.triggered(utt_sec, sil_sec, said) for r in self.rules)
