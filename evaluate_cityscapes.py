#!/usr/bin/env python
"""Reference-compatible entry point: Cityscapes val inference -> PNGs."""

from adaptsegnet_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
