from tweediemix_tpu.ops.attention import attention, multi_head_attention
from tweediemix_tpu.ops.stacked import lora_delta, stacked_linear

__all__ = ["attention", "multi_head_attention", "stacked_linear", "lora_delta"]
