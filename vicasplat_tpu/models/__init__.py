from .adapter import GaussianAdapterConfig, Gaussians, adapt_gaussians  # noqa: F401
from .vicanet import VicaNetConfig, init_vicanet, vicanet_forward  # noqa: F401
from .vicasplat import (  # noqa: F401
    VicaSplatConfig,
    init_vicasplat,
    normalize_images,
    vicasplat_forward,
)

ENCODERS = {"vicasplat": (VicaSplatConfig, init_vicasplat, vicasplat_forward)}


def get_encoder(name: str):
    """Encoder registry (reference: src/model/encoder/__init__.py:14-19)."""
    return ENCODERS[name]
