from fresco_tpu.attention.flash import flash_attention
from fresco_tpu.attention.fresco_attention import (
    FrescoAttnParams,
    fresco_self_attention,
)
