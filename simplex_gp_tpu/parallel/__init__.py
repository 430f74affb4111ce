from .mesh import data_parallel_loss_fn, make_mesh, replicate, shard_batch  # noqa: F401
