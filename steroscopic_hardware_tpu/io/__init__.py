"""Image and codec I/O: PNG, PGM, LZMA frame compression."""

from steroscopic_hardware_tpu.io.png import read_png, write_png
from steroscopic_hardware_tpu.io.pgm import read_pgm, write_pgm

__all__ = ["read_png", "write_png", "read_pgm", "write_pgm"]
