"""Rider/bicycle dynamics model families.

Each model module exposes:
  - ``N_STATES``: number of meaningful entries of the unified state vector,
  - ``DEST_FORCE`` / ``REP_FORCE``: default force-strategy names
    (the reference's strategy-injection API, vehicle.py:111-135),
  - ``step(params, state, fx, fy) -> state``: one pure, vectorized
    dynamics/control step for the whole population.
"""

from cyclistsocialforce_tpu.models import bicycle2d

MODELS = {
    "bicycle2d": bicycle2d,     # reference "planartwowheel" / Bicycle
}

__all__ = ["MODELS", "bicycle2d"]
