import sys

from old_kaldi_git_tpu.bin.tools import main

sys.exit(main(sys.argv[1:]))
