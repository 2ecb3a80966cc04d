#!/usr/bin/env python
"""Enumerate real serial devices — the reference's ports example
(``examples/ports/main.go:1-44``: go.bug.st/serial/enumerator walk
printing each detected port).

  python examples/list_ports.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from steroscopic_hardware_tpu.runtime.sources import list_serial_ports


def main():
    ports = list_serial_ports()
    if not ports:
        print("no serial ports found")
        return 1
    for p in ports:
        print(p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
