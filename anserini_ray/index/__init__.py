from .build import IndexConfig, TokenizeDocs, build_index
from .optimize import optimize_index
from .varint import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)

__all__ = [
    "IndexConfig", "TokenizeDocs", "build_index", "optimize_index",
    "decode_postings", "delta_decode", "delta_encode",
    "encode_postings", "varint_decode", "varint_encode",
]
