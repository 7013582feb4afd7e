#!/usr/bin/env python3
"""Root-level test entry point (reference CLI parity: python3 test.py ...)."""
from semseg_tpu.cli.test import main

if __name__ == "__main__":
    main()
