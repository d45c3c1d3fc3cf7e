"""Rider/bicycle dynamics model families.

Each model module exposes:
  - ``N_STATES``: number of meaningful entries of the unified state vector,
  - ``DEST_FORCE`` / ``REP_FORCE``: default force-strategy names
    (the reference's strategy-injection API, vehicle.py:111-135),
  - ``step(params, state, fx, fy) -> state``: one pure, vectorized
    dynamics/control step for the whole population.
"""

from cyclistsocialforce_tpu.models import (balancingrider, bicycle2d,
                                           bicycle_twod, hessbikerider,
                                           invpendulum, planarbicycle,
                                           planarpoint)

MODELS = {
    "bicycle2d": bicycle2d,          # reference "planartwowheel" / Bicycle
    "twod": bicycle_twod,            # reference TwoDBicycle ("2D model")
    "planarpoint": planarpoint,      # reference PlanarPointBicycle
    "invpendulum": invpendulum,      # reference InvPendulumBicycle
    "balancingrider": balancingrider,  # reference BalancingRiderBicycle
    "planarbicycle": planarbicycle,  # reference PlanarBicycle
    "hess": hessbikerider,           # reference HessBikeRiderDynamics
}


def prepare(model, params, state):
    """Model-specific state initialization (dynamics-internal latents),
    the analog of the reference's Dynamics.__init__ state transforms."""
    fn = getattr(model, "prepare", None)
    return fn(params, state) if fn is not None else state


__all__ = ["MODELS", "prepare", "bicycle2d", "bicycle_twod", "planarpoint"]
