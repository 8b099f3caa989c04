"""Host-side data pipelines: raw audio, token corpora, MIDI events."""
