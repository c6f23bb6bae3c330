from .mesh import make_mesh, batch_sharding, param_shardings, replicate_to_mesh
