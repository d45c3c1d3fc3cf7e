from cyclistsocialforce_tpu.utils.angles import (
    angle_difference,
    angle_sfm_to_sumo,
    angle_sumo_to_sfm,
    cart2polar,
    expand_angle,
    limit_angle,
    limit_magnitude,
    polar2cart,
    thresh,
    to_deg,
    to_rad,
)

__all__ = [
    "angle_difference",
    "angle_sfm_to_sumo",
    "angle_sumo_to_sfm",
    "cart2polar",
    "expand_angle",
    "limit_angle",
    "limit_magnitude",
    "polar2cart",
    "thresh",
    "to_deg",
    "to_rad",
]
