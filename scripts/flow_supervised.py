#!/usr/bin/env python
"""Entry point for the flow_supervised method (reference-repo surface parity)."""
import sys
from floodseg_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] + ["--method", "flow_supervised"]))
