from comfyui_keep_tpu.parallel.mesh import (
    make_mesh, init_distributed, get_dist_info, data_sharding,
    replicated_sharding, reduce_loss_dict)
from comfyui_keep_tpu.parallel.inference import restore_chunks_parallel
