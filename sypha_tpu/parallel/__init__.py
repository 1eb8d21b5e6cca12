from sypha_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    solve_lp_batch_sharded,
    pooled_stats,
)

__all__ = ["make_mesh", "shard_batch", "solve_lp_batch_sharded", "pooled_stats"]
