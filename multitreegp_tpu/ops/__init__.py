from .initialization import make_population_sampler, make_tree_sampler
from .splice import splice, extract_subtree, compose1, compose2, leaf_block
from .crossover import crossover_trees, crossover_candidates
from .mutation import make_mutators
from .reproduction import (
    tournament_select,
    make_evolve_island,
    make_evolve_populations,
    migrate_ring,
    island_hyperparams,
)
from .constant_opt import make_constant_optimiser
