"""``python -m planeverb_tpu`` — sandbox CLI entry point."""

import sys

from planeverb_tpu.sandbox.cli import main

if __name__ == "__main__":
    sys.exit(main())
