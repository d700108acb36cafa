"""Task entry points mirroring the reference's main_*/benchmark_* scripts."""
