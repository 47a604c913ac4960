from .io import (
    load_cameras,
    load_obj_mask_as_numpy,
    load_depth_as_numpy,
    imread,
    imwrite,
)
from .checkpoint import save_checkpoint, load_checkpoint
from .pipeline import pipelined_foreach
