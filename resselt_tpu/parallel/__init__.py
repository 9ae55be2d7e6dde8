from .mesh import batch_sharding, make_mesh, param_sharding, replicated, shard_params
from .tiling import TileGrid, extract_tiles, plan_grid, stitch_tiles, upscale_tiled

__all__ = [
    'TileGrid',
    'batch_sharding',
    'extract_tiles',
    'make_mesh',
    'param_sharding',
    'plan_grid',
    'replicated',
    'shard_params',
    'stitch_tiles',
    'upscale_tiled',
]
