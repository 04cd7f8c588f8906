"""Multi-chip scale-out: device meshes, view-parallel rendering, and
row-sharded single-frame rendering."""

from .multi_view import (  # noqa: F401
    MultiViewRenderer,
    make_view_mesh,
    stack_params,
)
from .tile_sharding import TileShardedRenderer  # noqa: F401
