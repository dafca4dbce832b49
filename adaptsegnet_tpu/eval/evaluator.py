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
from adaptsegnet_tpu.ops.metrics import fast_hist_jax
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

    return jax.jit(_make_mask_fn(model, out_hw, output_index, dtype,
                                 use_pallas_tail))


def _make_mask_fn(model, out_hw, output_index, dtype, use_pallas_tail):
    """(variables, images) -> uint8 mask; the single eval forward body
    shared by make_eval_fn and make_eval_hist_fn so the two paths cannot
    drift."""
    # bf16 compute implies the fast resize path (throughput mode); f32 keeps
    # the exact torch-parity interpolation that gates bit-matching mIoU.
    # The fused Pallas upsample+argmax kernel (ops/pallas) wins 2.1x on the
    # isolated tail but in-graph XLA overlaps the tail with the last convs,
    # measuring equal-or-better — so the kernel stays opt-in.
    exact = dtype == jnp.float32
    use_pallas = (
        use_pallas_tail and not exact and jax.default_backend() != "cpu"
    )

    def mask_fn(variables, images):
        preds = model.apply(variables, images.astype(dtype))
        pred = preds[output_index] if isinstance(preds, (tuple, list)) else preds
        if use_pallas:
            from adaptsegnet_tpu.ops.pallas import upsample_argmax

            return upsample_argmax(pred, out_hw)
        up = upsample_logits(pred, out_hw, exact=exact)
        return jnp.argmax(up, axis=-1).astype(jnp.uint8)

    return mask_fn


def make_eval_hist_fn(
    model,
    out_hw: tuple[int, int] = (1024, 2048),
    output_index: int = 1,
    num_classes: int = 19,
    dtype=jnp.float32,
    use_pallas_tail: bool = False,
) -> Callable:
    """Jitted (variables, images, labels) -> (masks uint8, hist int32).

    The PNG-free streaming-mIoU tail: the confusion matrix accumulates ON
    DEVICE (one-hot matmul, ops/metrics.fast_hist_jax) so only 19x19 ints —
    not full-resolution masks — need crossing device->host per batch.
    Labels are train ids at out_hw resolution; out-of-range ids (255
    ignore / padding) contribute nothing. Under a data-parallel mesh the
    batch axis is sharded and GSPMD turns the hist reduction into a psum
    over ICI — the TPU replacement for the reference's default multi-GPU
    DataParallel eval (evaluate_cityscapes.py:92,145-146).
    """
    mask_fn = _make_mask_fn(model, out_hw, output_index, dtype,
                            use_pallas_tail)

    @jax.jit
    def eval_hist_fn(variables, images, labels):
        masks = mask_fn(variables, images)
        return masks, fast_hist_jax(labels, masks, num_classes)

    return eval_hist_fn


class Evaluator:
    """Streams a CityscapesDataset through a jitted eval fn, writing PNGs.

    Mirrors the reference's per-snapshot loop body; `save_dir=None` skips
    PNG output. `run_streaming` accumulates the device-side confusion
    matrix instead (PNG-free mIoU). Pass `mesh` (a 1-D data-parallel
    jax.sharding.Mesh, parallel.make_mesh) to shard the eval batch over
    devices — the reference evaluates with nn.DataParallel BY DEFAULT
    (evaluate_cityscapes.py:92,145-146); this is its ICI-native
    counterpart. batch_size must then be a multiple of the mesh size.
    """

    def __init__(
        self,
        model,
        out_hw: tuple[int, int] = (1024, 2048),
        output_index: int = 1,
        save_dir: Optional[str] = None,
        mesh=None,
        num_classes: int = 19,
    ):
        self.eval_fn = make_eval_fn(model, out_hw=out_hw,
                                    output_index=output_index)
        self._model = model
        self._out_hw = out_hw
        self._output_index = output_index
        self._num_classes = num_classes
        self._hist_fn = None  # built lazily by run_streaming
        self.mesh = mesh
        self.save_dir = save_dir
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)

    def _shard_fn(self):
        if self.mesh is None:
            return None
        from adaptsegnet_tpu.parallel import batch_sharding

        return lambda leaf: batch_sharding(self.mesh, leaf.ndim, batch_axis=0)

    def _prepare(self, variables, batch_size):
        if self.mesh is None:
            return variables
        if batch_size % self.mesh.size:
            raise ValueError(
                f"eval batch {batch_size} not divisible by the "
                f"{self.mesh.size}-device mesh"
            )
        from adaptsegnet_tpu.parallel import replicate

        return replicate(self.mesh, variables)

    def _stream(self, variables, ds, batch_size, num_workers,
                progress_every, stacked, pad_value, step) -> list[str]:
        """Shared streaming skeleton for run / run_streaming.

        Host work overlaps device work: PIL decode runs ahead on a thread
        pool (PrefetchIterator) while PNG encodes trail behind on another —
        the device only ever waits for the next staged batch. The ragged
        tail (n % batch_size items) is padded so the jitted fn keeps its
        compiled shape, and the padded masks are dropped.

        stacked: item columns to stack into arrays (others stay lists);
        pad_value(col, last) -> tail padding element for a stacked column;
        step(variables, cols) -> masks for the batch (any extra
        accumulation closes over caller state). Returns written PNG paths.
        """
        from concurrent.futures import ThreadPoolExecutor

        from adaptsegnet_tpu.data.pipeline import PrefetchIterator, stack_collate

        variables = self._prepare(variables, batch_size)
        shard = self._shard_fn()
        n = len(ds)
        it = PrefetchIterator(
            ds, batch_size, collate=stack_collate(stacked), sharding=shard,
            shuffle=False, num_workers=num_workers,
            max_batches=n // batch_size,
        ) if n >= batch_size else None

        writer_pool = ThreadPoolExecutor(max_workers=2) if self.save_dir else None
        futures = []

        def handle(masks, names, start):
            if start % (progress_every * batch_size) == 0:
                print(f"{start} processd")  # reference log line (:157)
            if writer_pool is not None:
                for mask, name in zip(np.asarray(masks), names):
                    futures.append(
                        writer_pool.submit(self._save_mask, mask, name)
                    )

        start = 0
        if it is not None:
            for batch in it:
                handle(step(variables, batch), batch[-1], start)
                start += batch_size
            it.close()
        if start < n:
            items = [ds[i] for i in range(start, n)]
            k = len(items)
            cols = []
            for col in range(len(items[0])):
                vals = [item[col] for item in items]
                if col in stacked:
                    vals += [pad_value(col, vals[-1])] * (batch_size - k)
                    arr = np.stack(vals)
                    vals = (jax.device_put(arr, shard(arr)) if shard
                            else jnp.asarray(arr))
                cols.append(vals)
            handle(step(variables, tuple(cols))[:k], cols[-1], start)

        written = []
        if writer_pool is not None:
            for f in futures:
                written.append(f.result())
            writer_pool.shutdown()
        return written

    def run(self, variables, dataset, batch_size: int = 1,
            progress_every: int = 100, num_workers: int = 4) -> list[str]:
        """Evaluate every image; returns the list of written PNG paths."""
        return self._stream(
            variables, dataset, batch_size, num_workers, progress_every,
            stacked={0},
            pad_value=lambda col, last: last,
            step=lambda v, cols: self.eval_fn(v, cols[0]),
        )

    def run_streaming(
        self,
        variables,
        dataset,
        gt_loader: Callable[[str], np.ndarray],
        batch_size: int = 1,
        num_workers: int = 4,
        progress_every: int = 100,
    ) -> np.ndarray:
        """PNG-free streaming mIoU: returns the accumulated confusion matrix.

        `gt_loader(name) -> (H, W) int train-id label` at the evaluator's
        output resolution (use eval.compute_iou machinery / devkit mapping
        to build one). The hist is accumulated on device — per batch only
        19x19 ints stay live; under a mesh the batch is sharded and the
        reduction psums over ICI. PNGs are still written when save_dir is
        set (the masks come back from the same jitted program). Padded
        ragged-tail items carry all-ignore (255) labels so they contribute
        nothing to the hist.
        """
        if self._hist_fn is None:
            self._hist_fn = make_eval_hist_fn(
                self._model, out_hw=self._out_hw,
                output_index=self._output_index,
                num_classes=self._num_classes,
            )

        class _WithLabels:
            """Dataset adapter: item -> (image, label, name)."""

            def __init__(self, ds):
                self._ds = ds

            def __len__(self):
                return len(self._ds)

            def __getitem__(self, i):
                item = self._ds[i]
                image, name = item[0], item[-1]
                return image, gt_loader(name).astype(np.int32), name

        host_hist = np.zeros((self._num_classes, self._num_classes), np.int64)
        hist = None
        pixels_pending = 0
        batch_px = batch_size * self._out_hw[0] * self._out_hw[1]

        def flush():
            nonlocal hist, pixels_pending
            if hist is not None:
                host_hist[...] += np.asarray(jax.device_get(hist), np.int64)
                hist = None
                pixels_pending = 0

        def step(variables, cols):
            nonlocal hist, pixels_pending
            masks, h = self._hist_fn(variables, cols[0], cols[1])
            hist = h if hist is None else hist + h
            pixels_pending += batch_px
            # The device-side counts are int32; a cell can't exceed the
            # pixels accumulated since the last flush, so spilling to the
            # host int64 matrix before 2^30 pending pixels keeps them exact
            # (x64 is disabled, so there is no device int64 to lean on).
            # The device_get sync happens every ~512 full-res bs-1 batches.
            if pixels_pending >= (1 << 30) - batch_px:
                flush()
            return masks

        self._stream(
            variables, _WithLabels(dataset), batch_size, num_workers,
            progress_every,
            stacked={0, 1},
            pad_value=lambda col, last: (
                last if col == 0 else np.full_like(last, 255)
            ),
            step=step,
        )
        flush()
        return host_hist

    def _save_mask(self, mask, name):
        from PIL import Image

        base = name.split("/")[-1]
        out = osp.join(self.save_dir, base)
        Image.fromarray(np.asarray(mask)).save(out)
        colorize_mask(np.asarray(mask)).save(
            osp.join(self.save_dir, base.split(".")[0] + "_color.png")
        )
        return out
