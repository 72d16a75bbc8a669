from .debugging import (assert_all_finite, checkified, count_nonfinite,
                        debug_nans)
from .logging import (MetricsLogger, StepTimer, ThroughputMeter,
                      is_main_process, trace_capture)

__all__ = ["assert_all_finite", "checkified", "count_nonfinite",
           "debug_nans", "MetricsLogger", "StepTimer", "ThroughputMeter",
           "is_main_process", "trace_capture"]
