"""Multi-chip scale-out: device meshes and view-parallel rendering."""

from .multi_view import (  # noqa: F401
    MultiViewRenderer,
    make_view_mesh,
    stack_params,
)
