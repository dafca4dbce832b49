"""`python train_gta2cityscapes_multi.py <flags>` — TPU training driver.

Reference CLI surface (train_gta2cityscapes_multi.py:72-156) with the mode
constants exposed as real flags (--source-only/--no-source-only, --level).
"""

from __future__ import annotations

import numpy as np

from adaptsegnet_tpu.train.config import parse_args
from adaptsegnet_tpu.train.loop import train


def main(argv=None):
    cfg = parse_args(argv)
    np.random.seed(cfg.random_seed)
    from adaptsegnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    summary = train(cfg)
    return summary


if __name__ == "__main__":
    main()
