from .common import RenderSettings, preprocess, tile_grid  # noqa: F401
from .reference import render_reference  # noqa: F401
