"""Utilities: image IO, colormaps, .ocv binary interop, profiling, checkpoints."""
