"""TPU-native cyclist social-force simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`chris-konrad/cyclistsocialforce` (see SURVEY.md): microscopic simulation of
cyclists driven by social forces with velocity semantics, tracked by
controlled bicycle-dynamics models, running as structure-of-arrays pytrees
under jit/scan/shard_map on TPU.
"""

from cyclistsocialforce_tpu import engine, params, state
from cyclistsocialforce_tpu.engine import Engine
from cyclistsocialforce_tpu.state import AgentState, make_state

__version__ = "0.1.0"

__all__ = [
    "AgentState",
    "Engine",
    "engine",
    "make_state",
    "params",
    "state",
]
