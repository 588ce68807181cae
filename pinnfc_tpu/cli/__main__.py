"""`python -m pinnfc_tpu.cli` entry point."""

import sys

from pinnfc_tpu.cli.parser import main

if __name__ == "__main__":
    sys.exit(main())
