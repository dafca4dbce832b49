"""Training driver: wires config -> data -> fused step -> snapshots/logging.

The TPU rewrite of reference train_gta2cityscapes_multi.py:180-729. One
process drives a data-parallel mesh; batches are staged by the prefetching
pipeline with the mesh sharding; the jitted step runs G(+D) updates on
device. Snapshots keep the reference .pth naming per mode subdir
(source_only/single_level/multi_level) plus optional orbax full-state.
"""

from __future__ import annotations

import os.path as osp
from typing import Optional

import numpy as np
import jax

from adaptsegnet_tpu.data import (
    CityscapesDataset,
    GTA5Dataset,
    PrefetchIterator,
    SynscapesDataset,
)
from adaptsegnet_tpu.parallel import (
    auto_mesh_size,
    batch_sharding,
    make_mesh,
    replicate,
)
from adaptsegnet_tpu.train.build import build_train_state
from adaptsegnet_tpu.train.config import TrainConfig
from adaptsegnet_tpu.train.steps import (
    make_adversarial_step,
    make_source_only_step,
)
from adaptsegnet_tpu.utils.checkpoint import CheckpointManager, save_snapshot_pth
from adaptsegnet_tpu.utils.logging import ScalarLogger, format_losses
from adaptsegnet_tpu.utils.profiling import StepTimer


def _mode_subdir(cfg: TrainConfig) -> str:
    if cfg.source_only:
        return "source_only"
    return {"single-level": "single_level", "multi-level": "multi_level"}[
        cfg.level
    ]


def _batch_iter(cfg: TrainConfig, mesh=None):
    """Yield step batches shaped (iter_size, B, H, W, ...).

    Batches are collated directly to the (iter_size, B, ...) step layout
    inside the prefetch thread and staged ONCE with the mesh batch sharding
    (axis 1), so input staging fully overlaps the running step — no host
    reshape or second device_put on the critical path. On a multi-process
    runtime each host decodes only its interleaved slice of the global batch
    (`shard_by_process`) and stages its local shard
    (jax.make_array_from_process_local_data in data/pipeline.py). This is
    the TPU-native replacement for the reference's DataLoader feed + the
    DataParallel scatter (train_gta2cityscapes_multi.py:235-238,224-225).
    """
    max_iters = cfg.num_steps * cfg.iter_size * cfg.batch_size
    n_proc = jax.process_count()
    if cfg.batch_size % n_proc:
        raise ValueError(
            f"global batch {cfg.batch_size} not divisible by "
            f"{n_proc} processes"
        )
    local_bs = cfg.batch_size // n_proc
    per_step_local = cfg.iter_size * local_bs
    ishape = (cfg.iter_size, local_bs)

    shard_fn = None
    if mesh is not None:
        shard_fn = lambda leaf: batch_sharding(mesh, leaf.ndim, batch_axis=1)

    def collate_source(items):
        img = np.stack([it[0] for it in items])
        lab = np.stack([it[1] for it in items]).astype(np.int32)
        return {
            "images": img.reshape(ishape + img.shape[1:]),
            "labels": lab.reshape(ishape + lab.shape[1:]),
        }

    def collate_target(items):
        img = np.stack([it[0] for it in items])
        return {"target_images": img.reshape(ishape + img.shape[1:])}

    source_cls = {"GTA5": GTA5Dataset, "Synscapes": SynscapesDataset}[cfg.source]
    source = source_cls(
        cfg.data_dir, cfg.data_list, max_iters=max_iters,
        crop_size=cfg.crop_size_wh, scale=cfg.random_scale,
        mirror=cfg.random_mirror, seed=cfg.random_seed,
    )
    src_it = PrefetchIterator(
        source, per_step_local, collate=collate_source, sharding=shard_fn,
        shuffle=True, seed=cfg.random_seed, num_workers=cfg.num_workers,
        shard_by_process=True,
    )
    tgt_it = None
    if not cfg.source_only:
        target = CityscapesDataset(
            cfg.data_dir_target, cfg.data_list_target, max_iters=max_iters,
            crop_size=cfg.crop_size_wh_target, mirror=cfg.random_mirror,
            set=cfg.set, seed=cfg.random_seed,
        )
        tgt_it = PrefetchIterator(
            target, per_step_local, collate=collate_target, sharding=shard_fn,
            shuffle=True, seed=cfg.random_seed + 1,
            num_workers=cfg.num_workers, shard_by_process=True,
        )

    while True:
        batch = dict(next(src_it))
        if tgt_it is not None:
            batch.update(next(tgt_it))
        yield batch


def train(cfg: TrainConfig, max_steps: Optional[int] = None) -> dict:
    """Run training; returns a summary dict (final losses, snapshot paths)."""
    if cfg.cpu:
        # Reference --cpu (train_gta2cityscapes_multi.py:92-93,189). Only
        # effective before first backend use; warn if a non-CPU backend is
        # already live (platform selection is process-wide in JAX).
        jax.config.update("jax_platforms", "cpu")
        if jax.devices()[0].platform != "cpu":
            import logging

            logging.getLogger(__name__).warning(
                "--cpu requested but the %s backend is already initialized; "
                "continuing on it", jax.devices()[0].platform,
            )
    mesh = make_mesh(auto_mesh_size(cfg.batch_size, cfg.num_devices))
    state, modules = build_train_state(cfg)
    state = replicate(mesh, state)

    if cfg.source_only:
        step_fn = make_source_only_step(
            modules["model"],
            warper_module=modules.get("warper"),
            input_hw=cfg.input_hw,
            iter_size=cfg.iter_size,
        )
    else:
        step_fn = make_adversarial_step(
            modules["model"],
            modules["discriminator"],
            level=cfg.level,
            gan=cfg.gan,
            lambda_seg=cfg.lambda_seg,
            lambda_adv1=cfg.lambda_adv_target1,
            lambda_adv2=cfg.lambda_adv_target2,
            input_hw=cfg.input_hw,
            iter_size=cfg.iter_size,
            warper_module=modules.get("warper") if cfg.level == "single-level"
            else None,
        )

    logger = ScalarLogger(cfg.log_dir, cfg.tensorboard)
    ckpt_mgr = (
        CheckpointManager(osp.join(cfg.snapshot_dir, _mode_subdir(cfg), "orbax"))
        if cfg.orbax_checkpoints
        else None
    )
    if ckpt_mgr is not None and ckpt_mgr.latest_step() is not None:
        restored = ckpt_mgr.restore(state)
        if restored is not None:
            state = restored

    stop = min(cfg.num_steps_stop, max_steps or cfg.num_steps_stop)
    batches = _batch_iter(cfg, mesh=mesh)
    metrics = {}
    snapshots = []
    start_step = int(jax.device_get(state.step))

    def snapshot(step_tag: int):
        gvars = {
            "params": jax.device_get(state.generator.params),
            "batch_stats": jax.device_get(state.generator.batch_stats),
        }
        dvars = lambda d: (
            {"params": jax.device_get(d.params)} if d is not None else None
        )
        save_snapshot_pth(
            cfg.snapshot_dir, _mode_subdir(cfg), step_tag, gvars,
            d1_variables=dvars(state.d1), d2_variables=dvars(state.d2),
            model=cfg.model,
        )
        snapshots.append(
            osp.join(cfg.snapshot_dir, _mode_subdir(cfg),
                     f"GTA5_{step_tag}.pth")
        )
        if ckpt_mgr is not None:
            ckpt_mgr.save(step_tag, state)

    # Graceful preemption (the reference loses up to 5000 steps on a kill,
    # SURVEY.md §5.3): SIGTERM/SIGINT request a final snapshot + clean exit.
    import signal

    stop_requested = []

    def _on_signal(signum, frame):
        stop_requested.append(signum)

    old_handlers = {
        sig: signal.signal(sig, _on_signal)
        for sig in (signal.SIGTERM, signal.SIGINT)
    }

    timer = StepTimer(warmup=2)
    # Metric printing is decoupled from the step critical path: step i+1 is
    # enqueued BEFORE step i's metrics are pulled to host, so the (expensive,
    # per-call ~ms on the axon tunnel) device->host sync overlaps the next
    # step's compute. Per-iter print parity with the reference is kept by
    # printing one step late; the device_get on the previous step's metrics
    # doubles as the steady-state step-time measurement.
    pending = None  # (i_iter, device metrics of the previous step)

    def emit(item):
        it, dev_metrics = item
        host = {k: float(v) for k, v in jax.device_get(dev_metrics).items()}
        print(f"exp = {cfg.snapshot_dir}")
        print(format_losses(it, cfg.num_steps, host))
        logger.log(it, host)
        return host

    try:
        for i_iter in range(start_step, stop):
            if cfg.profile_dir and i_iter == start_step + 3:
                jax.profiler.start_trace(cfg.profile_dir)
            batch = next(batches)
            timer.start()
            state, metrics = step_fn(state, batch)
            if pending is not None:
                emit(pending)  # waits for step i-1 while step i runs
            timer.stop()
            pending = (i_iter, metrics)
            if cfg.profile_dir and i_iter == start_step + 6:
                jax.profiler.stop_trace()

            if stop_requested:
                print(f"signal {stop_requested[0]} received; snapshotting ...")
                snapshot(i_iter + 1)
                break
            if i_iter >= stop - 1:
                print("save model ...")
                snapshot(stop)
                break
            if i_iter % cfg.save_pred_every == 0 and i_iter != 0:
                print("taking snapshot ...")
                snapshot(i_iter)
        if pending is not None:
            emit(pending)  # flush the last step's (lagged) metrics
    finally:
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        logger.close()

    if timer._times:
        print(f"step time: mean {timer.mean*1000:.1f} ms, "
              f"p50 {timer.p50*1000:.1f} ms, best {timer.best*1000:.1f} ms")
    return {
        "final_metrics": {k: float(v) for k, v in jax.device_get(metrics).items()}
        if metrics else {},
        "snapshots": snapshots,
        "steps": stop,
        "step_time_p50": timer.p50,
    }
