from cunet_tpu.tools.convert_torch import (
    convert_state_dict,
    load_torch_checkpoint,
    merge_into,
)

__all__ = ["convert_state_dict", "load_torch_checkpoint", "merge_into"]
