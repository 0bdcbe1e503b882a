"""Host-side utilities: WER metrics, structured logging, checkpointing."""
