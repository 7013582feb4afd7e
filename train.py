#!/usr/bin/env python3
"""Root-level train entry point (reference CLI parity: python3 train.py ...)."""
from semseg_tpu.cli.train import main

if __name__ == "__main__":
    main()
