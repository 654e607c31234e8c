from evreal_tpu.convert.torch_ckpt import (
    convert_state_dict,
    nest,
    load_method_checkpoint,
    save_params,
    load_params,
)
