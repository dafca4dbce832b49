#!/usr/bin/env python
"""Reference-compatible entry point: GTA5->Cityscapes training on TPU.

Same flag surface as the reference script of the same name (see
adaptsegnet_tpu/train/config.py for the full list); runs the fused
jit/pjit training loop.
"""

from adaptsegnet_tpu.cli.train import main

if __name__ == "__main__":
    main()
