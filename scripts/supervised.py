#!/usr/bin/env python
"""Entry point for the supervised method (reference-repo surface parity)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from floodseg_tpu.cli.main import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] + ["--method", "supervised"]))
