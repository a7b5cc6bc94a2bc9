"""Base runtime: logging, typed binary I/O, Table (ark/scp) I/O, configs, data dirs.

Capability parity with reference src/base + src/util (SURVEY.md §2.1):
logging/asserts, io-funcs token framing, kaldi-table rspecifiers/wspecifiers,
parse-options flag system, wave reading, data-dir model.
"""

from old_kaldi_git_tpu.utils.log import get_logger, KaldiError
from old_kaldi_git_tpu.utils import io_funcs
from old_kaldi_git_tpu.utils.table import (
    SequentialTableReader,
    RandomAccessTableReader,
    TableWriter,
    read_table,
)
from old_kaldi_git_tpu.utils.parse_options import ParseOptions, options_dataclass
from old_kaldi_git_tpu.utils.data_dir import DataDir
from old_kaldi_git_tpu.utils.wav import WaveData, read_wav, write_wav
from old_kaldi_git_tpu.utils.pipeline import Pipeline, PipelineContext
