from .mesh import make_mesh, ray_sharding, replicated
from .sharded import shard_batch, sharded_train_step, sharded_render
from .spatial import (SpatialSpec, ShardedScene, build_sharded_scene,
                      shard_scene_put, render_rays_spatial,
                      render_rays_spatial_perspective,
                      perspective_halo_voxels)
