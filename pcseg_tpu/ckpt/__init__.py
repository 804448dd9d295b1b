from pcseg_tpu.ckpt.checkpoint import save_checkpoint, load_checkpoint
from pcseg_tpu.ckpt.torch_import import (
    import_torch_state_dict,
    load_best_model_pth,
    export_torch_state_dict,
)
