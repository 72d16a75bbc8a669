from .adamspd import AdamSPDState, adamspd
from .factory import decay_mask, make_optimizer, make_schedule

__all__ = ["AdamSPDState", "adamspd", "decay_mask", "make_optimizer",
           "make_schedule"]
