"""Case-agnostic cell-block execution engine (the TPU hot path)."""

from sphinxsys_tpu.engine.block_fluid import (  # noqa: F401
    BlockEngine, WallCtx, slot_fluid, build_wall_blocks, wall_windows,
    make_wall_ctx, null_wall_ctx, advection_prep, acoustic_step,
    blocks_to_particles,
)
