#!/usr/bin/env python
"""Reference-compatible entry point: offline mIoU over prediction PNGs."""

from adaptsegnet_tpu.cli.iou import main

if __name__ == "__main__":
    main()
