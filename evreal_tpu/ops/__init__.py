from evreal_tpu.ops.voxelize import voxelize, voxelize_scatter, voxelize_matmul
from evreal_tpu.ops.pad import CropParams
from evreal_tpu.ops.normalize import (
    normalize_event_tensor,
    post_process_normalization,
    robust_normalize,
)
