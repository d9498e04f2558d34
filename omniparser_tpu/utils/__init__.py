"""Host-side utilities: image codecs, profiling, logging."""
