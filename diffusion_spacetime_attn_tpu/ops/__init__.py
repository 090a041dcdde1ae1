from .attention import SpatialControl, attention, spacetime_cross_attention
from .masks import circular_mask, flat_circular_mask
from .schedule import DiffusionSchedule, make_schedule, q_sample

__all__ = [
    "SpatialControl", "attention", "spacetime_cross_attention",
    "circular_mask", "flat_circular_mask",
    "DiffusionSchedule", "make_schedule", "q_sample",
]
