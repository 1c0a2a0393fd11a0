from fresco_tpu.propagate.patchmatch import PatchMatchConfig, synthesize
