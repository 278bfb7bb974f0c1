#!/usr/bin/env python
"""Thin wrapper so `python scripts/segment.py ...` works like the reference CLI."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisperseg_tpu.cli.segment import main  # noqa: E402

if __name__ == "__main__":
    main()
