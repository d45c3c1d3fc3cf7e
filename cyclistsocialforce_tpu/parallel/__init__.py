from cyclistsocialforce_tpu.parallel.sharding import (
    AGENT_AXIS,
    make_mesh,
    required_halo,
    shard_state,
    sharded_simulate_fn,
    sharded_step_fn,
    state_pspecs,
)

__all__ = [
    "AGENT_AXIS",
    "make_mesh",
    "required_halo",
    "shard_state",
    "sharded_simulate_fn",
    "sharded_step_fn",
    "state_pspecs",
]
