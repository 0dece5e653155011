from .manifest import (
    IndexManifest,
    SegmentManifest,
    completed_segments,
    input_fingerprint,
)

__all__ = [
    "IndexManifest", "SegmentManifest", "completed_segments", "input_fingerprint",
]
