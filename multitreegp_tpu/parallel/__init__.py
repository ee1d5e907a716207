from .mesh import make_mesh, island_sharding, shard_population
from .collective import (
    make_evolve_populations_collective,
    global_best,
)
