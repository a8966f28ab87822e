from .mesh import make_mesh, shard_state, sharded_train_step
