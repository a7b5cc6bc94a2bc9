"""Online/streaming decoding.

Parity with reference src/online2 (SURVEY.md §2.7, §3.5):
OnlineFeaturePipeline (streaming MFCC + causal CMVN + deltas with lookahead
latency), StreamingDecoder (SingleUtteranceNnet3Decoder role: chunked
acoustic evaluation with receptive-field context, carried beam state,
incremental best path), and endpoint rules over trailing silence /
utterance length (online-endpoint.h).
"""

from old_kaldi_git_tpu.online.streaming import (
    OnlineFeaturePipeline,
    StreamingDecoder,
    EndpointRule,
    default_endpoint_rules,
)
