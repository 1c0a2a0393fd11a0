from fresco_tpu.utils.profiling import phase_timer, trace, PhaseTimes
