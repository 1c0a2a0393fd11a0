"""ctypes bindings + lazy build of the native CPU patch-synthesis backend."""
from fresco_tpu.propagate.native.binding import (
    build_library,
    is_available,
    synthesize_level_native,
)
