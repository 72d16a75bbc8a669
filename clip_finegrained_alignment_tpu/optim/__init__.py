from .adamspd import AdamSPDState, adamspd
from .factory import decay_mask, make_optimizer, make_schedule
from .interop import (adamspd_state_from_reference, adamw_group_orders,
                      adamw_state_from_reference, find_adamspd_state,
                      hf_named_parameter_order,
                      reference_adamw_optimizer_state_dict,
                      reference_optimizer_state_dict,
                      replace_adamspd_state, replace_scale_by_adam)

__all__ = ["AdamSPDState", "adamspd", "decay_mask", "make_optimizer",
           "make_schedule", "adamspd_state_from_reference",
           "adamw_group_orders", "adamw_state_from_reference",
           "find_adamspd_state", "hf_named_parameter_order",
           "reference_adamw_optimizer_state_dict",
           "reference_optimizer_state_dict", "replace_adamspd_state",
           "replace_scale_by_adam"]
