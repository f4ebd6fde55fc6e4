"""sgnerf_tpu — a TPU-native rebuild of SG-NeRF (semantic-guided point-based NeRF).

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Quyans/SG-NeRF reference (Point-NeRF lineage): neural point clouds, voxel-grid
neighbor queries, MLP aggregation shading, volume rendering, semantic guidance
(BPNet-style 2D/3D features), MVS point initialization, per-scene fine-tuning
with point growing/pruning, editing and video rendering.

Design principles (TPU-first, not a port):
  * static shapes + masks everywhere (no ragged compaction) so everything jits;
  * a persistent voxel grid over the point cloud, rebuilt only when the point
    set changes (the reference rebuilds per forward call);
  * dense [R*SR*K, C] MLP blocks that map onto the MXU;
  * rays shard over a `jax.sharding.Mesh` via shard_map (pure DP over rays,
    point cloud + params replicated), gradient psum over ICI.
"""

__version__ = "0.1.0"
