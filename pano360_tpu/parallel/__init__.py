"""Multi-chip scale-out over a jax.sharding.Mesh (ICI collectives)."""

from pano360_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, sharded_extract, sharded_pair_match, distributed_lm_stats,
    distributed_step, sharded_color_extract, sharded_match_all_pairs,
)
