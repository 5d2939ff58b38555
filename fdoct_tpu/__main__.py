"""``python -m fdoct_tpu`` → the fdoct CLI."""

import sys

from fdoct_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
