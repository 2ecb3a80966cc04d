#!/usr/bin/env python
"""LZMA compress/decompress CLI.

Parity with ``examples/lzma/main.go:1-260`` (flags -c/-d/-k/-l; classic
.lzma container via FORMAT_ALONE).
"""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from steroscopic_hardware_tpu.io import lzma_codec


def main():
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("-c", "--compress", action="store_true")
    g.add_argument("-d", "--decompress", action="store_true")
    ap.add_argument("-k", "--keep", action="store_true",
                    help="keep the input file")
    ap.add_argument("-l", "--level", type=int, default=5,
                    help="compression level 1-9")
    ap.add_argument("file")
    args = ap.parse_args()

    with open(args.file, "rb") as f:
        data = f.read()

    if args.compress:
        out_path = args.file + ".lzma"
        out = lzma_codec.compress_known_size(data, args.level)
    else:
        out_path = (args.file[:-5] if args.file.endswith(".lzma")
                    else args.file + ".out")
        out = lzma_codec.decompress(data)

    with open(out_path, "wb") as f:
        f.write(out)
    if not args.keep:
        os.remove(args.file)
    print(f"{args.file} -> {out_path} "
          f"({len(data)} -> {len(out)} bytes)")


if __name__ == "__main__":
    main()
