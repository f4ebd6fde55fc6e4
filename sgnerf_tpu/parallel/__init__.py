from .mesh import make_mesh, ray_sharding, replicated
from .sharded import shard_batch, sharded_train_step, sharded_render
