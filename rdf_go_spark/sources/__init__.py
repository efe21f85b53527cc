from .transcripts import (  # noqa: F401
    synth_transcripts, synth_entities, transcripts_sql, entities_sql,
    n_conv_for_sf_dir,
)
