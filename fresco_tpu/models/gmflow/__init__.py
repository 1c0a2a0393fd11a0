from fresco_tpu.models.gmflow.model import GMFlow, GMFlowConfig
