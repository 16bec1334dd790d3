"""Distributed execution over TPU meshes.

Replaces the reference's DDP/NCCL stack (`train_alignn.py:27-44,432-457`,
`train.py:205-207`, `data.py:357-364`) with JAX-native SPMD:

- data parallelism: `shard_map` over a 1-D mesh, per-device micro-batch,
  gradient `pmean` over ICI (:mod:`alignn_tpu.parallel.dp`);
- multi-host: `jax.distributed.initialize` rendezvous
  (:func:`alignn_tpu.parallel.mesh.initialize_distributed`);
- graph partitioning: edge-sharded message passing with halo exchange
  (:mod:`alignn_tpu.parallel.edge_partition`) — beyond the reference's
  capabilities (it has data parallelism only, SURVEY.md §2b).
"""

from alignn_tpu.parallel.mesh import make_mesh, initialize_distributed

__all__ = ["make_mesh", "initialize_distributed"]
