from pcseg_tpu.utils.observe import (
    MetricsLogger,
    StepTimer,
    profile_trace,
    named_scope,
)
