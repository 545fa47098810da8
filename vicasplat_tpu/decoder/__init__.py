from .splatting import DecoderSplattingConfig, decoder_forward  # noqa: F401

DECODERS = {"splatting_cuda": (DecoderSplattingConfig, decoder_forward),
            "splatting": (DecoderSplattingConfig, decoder_forward)}


def get_decoder(name: str):
    """Decoder registry (reference: src/model/decoder/__init__.py)."""
    return DECODERS[name]
