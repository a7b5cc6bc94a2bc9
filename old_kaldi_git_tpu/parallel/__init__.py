"""Parallelism: device meshes, sharded train/decode steps, collectives.

Replaces the reference's job-array + NFS fabric (SURVEY.md §2.8) with
jax.sharding: data parallelism = batch axis over the mesh (P1/P3 →
synchronous pmean), sufficient-statistics reduction = psum (P2), model
parallelism = parameter PartitionSpecs (P4), multi-host = jax.distributed.
"""

from old_kaldi_git_tpu.parallel.mesh import (
    MeshConfig,
    make_mesh,
    shard_batch,
    replicate,
)
