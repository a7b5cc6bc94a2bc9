"""old_kaldi_git_tpu — a TPU-native speech-recognition framework.

A from-scratch re-design of the Kaldi ASR toolkit (reference:
vimalmanohar/old-kaldi-git) for TPU hardware:

* tensor plane: JAX/XLA/Pallas — features, acoustic models, forward-backward,
  batched Viterbi/lattice beam search (``feat/``, ``gmm/``, ``models/``,
  ``chain/``, ``decoder/``, ``ops/``);
* graph plane: CPU-side WFST construction and lattice post-processing
  (``fst/``, ``tree/``, ``hmm/``, ``lat/``);
* scale-out: ``jax.sharding`` meshes + collectives (``parallel/``), not
  job arrays over NFS.

Design blueprint: /root/repo/SURVEY.md.  Layer map mirrors the reference's
src/{base,util,matrix,feat,tree,gmm,hmm,fstext,decoder,lat,nnet3,chain}
capabilities (SURVEY.md §1-2) in array-first, SPMD form.
"""

__version__ = "0.1.0"
