"""alignn_tpu: TPU-native line-graph GNN framework (ALIGNN model family).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
usnistgov/alignn: edge-gated graph convolutions over a crystal graph g and
its line graph L(g), RBF bond/angle featurization, padded-bucket batching,
energy/force/stress heads with forces from jax.grad, data-parallel and
edge-partitioned execution over TPU meshes.
"""

__version__ = "0.1.0"
