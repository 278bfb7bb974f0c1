#!/usr/bin/env python
"""Training entry point, CLI-compatible with the reference's top-level train.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whisperseg_tpu.cli.train import main  # noqa: E402

if __name__ == "__main__":
    main()
