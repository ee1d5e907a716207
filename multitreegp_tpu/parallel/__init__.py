from .mesh import make_mesh, island_sharding, shard_population
