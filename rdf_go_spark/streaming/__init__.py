from .pipeline import (  # noqa: F401
    stream_transcripts, streaming_prev_turn, streaming_triples,
    windowed_turn_metrics, run_availablenow, run_availablenow_complete,
)
