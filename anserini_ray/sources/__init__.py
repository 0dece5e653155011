from .transcripts import (
    TRANSCRIPT_SCHEMA,
    TRANSCRIPTS_SQL,
    generate_transcripts,
    transcripts_from_documents,
    write_synthetic_corpus,
)

__all__ = [
    "TRANSCRIPT_SCHEMA", "TRANSCRIPTS_SQL", "generate_transcripts",
    "transcripts_from_documents", "write_synthetic_corpus",
]
