from .render import RasterizeConfig, render  # noqa: F401
