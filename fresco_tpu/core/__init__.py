from fresco_tpu.core.config import FrescoConfig, load_config
from fresco_tpu.core.mesh import make_mesh, shard_frames
