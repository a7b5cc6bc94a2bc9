from old_kaldi_git_tpu.kws.search import (  # noqa: F401
    KwsHit,
    build_kws_index,
    search_index,
    search_phrase,
)
from old_kaldi_git_tpu.kws.atwv import compute_atwv  # noqa: F401
