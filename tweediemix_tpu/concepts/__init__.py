from tweediemix_tpu.concepts.delta import (
    cd_delta_from_reference,
    load_reference_delta,
    lora_delta_from_reference,
    stack_cd_params,
    stack_lora_params,
)

__all__ = [
    "stack_cd_params",
    "stack_lora_params",
    "load_reference_delta",
    "cd_delta_from_reference",
    "lora_delta_from_reference",
]
