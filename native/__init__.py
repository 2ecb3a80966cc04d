"""Native C++ runtime sources, shipped inside the wheel so installed
packages can build ``libshtpu_native.so`` on first use (``_native.py``;
in the development tree this directory is the top-level ``native/``)."""
