from .render import (  # noqa: F401
    RasterizeConfig,
    coverage_stats,
    render,
    select_raster_config,
)
