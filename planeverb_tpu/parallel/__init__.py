"""Multi-chip execution: device mesh + spatially sharded FDTD solver.

The reference is single-process shared-memory C++ with no distributed story
(SURVEY.md §2 parallelism inventory). This package is the TPU-native design
the reference never had: the solver grid is sharded over a 2D
``jax.sharding.Mesh``, one-cell halos are exchanged via ``ppermute`` each
timestep inside ``shard_map`` (riding ICI), and the analyzer runs under the
same sharding with XLA inserting the few collectives it needs.
"""

from planeverb_tpu.parallel.mesh import (grid_mesh, mesh_from_count,
                                         pad_to_mesh)
from planeverb_tpu.parallel.multihost import (init_distributed,
                                              multihost_grid_mesh)
from planeverb_tpu.parallel.solver import simulate_sharded, simulate_sharded_wide
from planeverb_tpu.parallel.solver_pallas import (pipeline_sharded,
                                                  simulate_moments_sharded,
                                                  simulate_sharded_pallas)

__all__ = ["grid_mesh", "mesh_from_count", "pad_to_mesh", "simulate_sharded",
           "simulate_sharded_wide", "simulate_sharded_pallas",
           "simulate_moments_sharded", "pipeline_sharded",
           "init_distributed", "multihost_grid_mesh"]
