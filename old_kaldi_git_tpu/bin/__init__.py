"""Command-line tools mirroring the reference's binaries (SURVEY.md §2 L9).

The reference exposes ~500 single-purpose binaries composed via pipes; here
the same capabilities are library APIs, plus these thin CLI wrappers for the
most-used tools so shell pipelines keep working:

    python -m old_kaldi_git_tpu.bin <tool> [options] <args...>

Run with no arguments for the tool list.  Each tool follows the reference's
conventions: rspecifiers/wspecifiers, --config, self-documenting --help.
"""
