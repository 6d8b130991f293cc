from .transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    read_transcripts,
    synthesize_transcripts,
    transcripts_path_for_sf,
)
