from accunet_tpu.port.torch_state import (
    import_torch_state,
    load_torch_checkpoint,
)
