from .mesh import batch_sharding, make_mesh, param_sharding, replicated, shard_params
from .moe import init_moe_params, moe_apply_dense, moe_apply_ep, shard_moe_params
from .pipeline import chunk_blocks, masked_stage_fn, pipeline_apply, shard_stacked_params, stack_stages
from .tiling import TileGrid, extract_tiles, plan_grid, stitch_tiles, upscale_padded, upscale_tiled

__all__ = [
    'TileGrid',
    'batch_sharding',
    'extract_tiles',
    'init_moe_params',
    'make_mesh',
    'moe_apply_dense',
    'moe_apply_ep',
    'param_sharding',
    'pipeline_apply',
    'plan_grid',
    'replicated',
    'shard_moe_params',
    'shard_params',
    'chunk_blocks',
    'masked_stage_fn',
    'shard_stacked_params',
    'stack_stages',
    'stitch_tiles',
    'upscale_padded',
    'upscale_tiled',
]
