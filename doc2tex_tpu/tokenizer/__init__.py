from .converters import AttnLabelConverter, TFMLabelConverter, create_converter
from .vocab import load_vocab, build_vocab

__all__ = [
    "AttnLabelConverter",
    "TFMLabelConverter",
    "create_converter",
    "load_vocab",
    "build_vocab",
]
