from cyclistsocialforce_tpu.ops import control, forces, navigation

__all__ = ["control", "forces", "navigation"]
