"""Table holder for FSTs ("fst") — training-graph archives.

Reference parity: compile-train-graphs writes `ark:fsts.JOB` of per-utterance
decoding graphs (src/util/kaldi-holder.h TableWriter<VectorFstHolder>); the
align/decode tools read them back.  The binary frame is the framework's
self-delimiting OKTFST01 record; text mode prints arcs like fstprint.
"""

from __future__ import annotations

from old_kaldi_git_tpu.fst.vector_fst import VectorFst
from old_kaldi_git_tpu.utils.log import KaldiError
from old_kaldi_git_tpu.utils.table import Holder, register_holder


class VectorFstHolder(Holder):
    def write(self, f, value: VectorFst, binary: bool) -> None:
        if not binary:
            raise KaldiError("fst holder: text table mode not supported")
        value.write(f)

    def read(self, f) -> VectorFst:
        return VectorFst.read(f)


register_holder("fst", VectorFstHolder)
