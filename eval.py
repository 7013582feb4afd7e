#!/usr/bin/env python3
"""Root-level eval entry point (reference CLI parity: python3 eval.py ...)."""
from semseg_tpu.cli.eval import main

if __name__ == "__main__":
    main()
