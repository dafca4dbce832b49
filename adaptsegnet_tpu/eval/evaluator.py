"""Cityscapes val evaluator (reference evaluate_cityscapes.py:96-208).

Protocol: network forward at 512x1024 (crop_size (1024, 512) W,H), bilinear
align-corners upsample of the logits to 1024x2048 BEFORE argmax (reference
:150-169), save raw-id + palette PNGs per image.

TPU-native: the forward + upsample + argmax is one jitted program emitting a
uint8 mask — only H*W bytes cross device->host per image instead of the
reference's full 19-channel f32 logit tensor (:163). With `hist=True` the
19x19 confusion matrix accumulates on device (one-hot matmul) so streaming
mIoU needs no PNGs at all.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops import upsample_logits
from adaptsegnet_tpu.eval.palette import colorize_mask


def make_eval_fn(
    model,
    out_hw: tuple[int, int] = (1024, 2048),
    output_index: int = 1,
    dtype=jnp.float32,
    use_pallas_tail: bool = False,
) -> Callable:
    """Jitted (variables, images NHWC) -> uint8 mask (N, H, W).

    output_index selects pred2 for DeeplabMulti (reference :161-163); for
    single-output models (VGG/Oracle adapters returning tuples) index 1 is
    the main output as well.
    """

    # bf16 compute implies the fast resize path (throughput mode); f32 keeps
    # the exact torch-parity interpolation that gates bit-matching mIoU.
    # The fused Pallas upsample+argmax kernel (ops/pallas) wins 2.1x on the
    # isolated tail but in-graph XLA overlaps the tail with the last convs,
    # measuring equal-or-better — so the kernel stays opt-in.
    exact = dtype == jnp.float32
    use_pallas = (
        use_pallas_tail and not exact and jax.default_backend() != "cpu"
    )

    @jax.jit
    def eval_fn(variables, images):
        preds = model.apply(variables, images.astype(dtype))
        pred = preds[output_index] if isinstance(preds, (tuple, list)) else preds
        if use_pallas:
            from adaptsegnet_tpu.ops.pallas import upsample_argmax

            return upsample_argmax(pred, out_hw)
        up = upsample_logits(pred, out_hw, exact=exact)
        return jnp.argmax(up, axis=-1).astype(jnp.uint8)

    return eval_fn


class Evaluator:
    """Streams a CityscapesDataset through a jitted eval fn, writing PNGs.

    Mirrors the reference's per-snapshot loop body; `save_dir=None` skips PNG
    output (device-side mIoU only, via `hist_update`).
    """

    def __init__(
        self,
        model,
        out_hw: tuple[int, int] = (1024, 2048),
        output_index: int = 1,
        save_dir: Optional[str] = None,
    ):
        self.eval_fn = make_eval_fn(model, out_hw=out_hw,
                                    output_index=output_index)
        self.save_dir = save_dir
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)

    def run(self, variables, dataset, batch_size: int = 1,
            progress_every: int = 100, num_workers: int = 4) -> list[str]:
        """Evaluate every image; returns the list of written PNG paths.

        Host work overlaps device work: PIL decode runs ahead on a thread
        pool (PrefetchIterator) while PNG encodes trail behind on another —
        the device only ever waits for the next staged batch.
        """
        from concurrent.futures import ThreadPoolExecutor

        from adaptsegnet_tpu.data.pipeline import PrefetchIterator, stack_collate

        n = len(dataset)
        it = PrefetchIterator(
            dataset, batch_size, collate=stack_collate({0}),
            shuffle=False, num_workers=num_workers,
            max_batches=n // batch_size,
        ) if n >= batch_size else None

        writer_pool = ThreadPoolExecutor(max_workers=2)
        futures = []
        written = []

        def save(mask, name):
            base = name.split("/")[-1]
            out = osp.join(self.save_dir, base)
            from PIL import Image

            Image.fromarray(np.asarray(mask)).save(out)
            colorize_mask(np.asarray(mask)).save(
                osp.join(self.save_dir, base.split(".")[0] + "_color.png")
            )
            return out

        def handle(masks, names, start):
            if start % (progress_every * batch_size) == 0:
                print(f"{start} processd")  # reference log line (:157)
            if self.save_dir:
                for mask, name in zip(np.asarray(masks), names):
                    futures.append(writer_pool.submit(save, mask, name))

        start = 0
        if it is not None:
            for batch in it:
                images = batch[0]
                names = batch[-1]
                handle(self.eval_fn(variables, images), names, start)
                start += batch_size
            it.close()
        if start < n:
            # Ragged tail (n % batch_size items): pad by repeating the last
            # item so the jitted eval fn keeps its compiled shape (no
            # recompile), then drop the padded masks.
            items = [dataset[i] for i in range(start, n)]
            k = len(items)
            imgs = [it_[0] for it_ in items]
            imgs += [imgs[-1]] * (batch_size - k)
            images = jnp.asarray(np.stack(imgs))
            names = [it_[-1] for it_ in items]
            masks = self.eval_fn(variables, images)[:k]
            handle(masks, names, start)

        for f in futures:
            written.append(f.result())
        writer_pool.shutdown()
        return written
