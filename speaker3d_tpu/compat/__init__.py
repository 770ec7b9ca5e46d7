from speaker3d_tpu.compat.torch_convert import (  # noqa: F401
    convert_torch_state_dict,
    export_torch_state_dict,
    load_into_model,
    load_torch_checkpoint,
    strip_ddp_prefix,
    variables_shape_tree,
)
