"""Config dataclass + CLI preserving the reference flag surface.

Flag names and defaults follow reference train_gta2cityscapes_multi.py:24-156
(documented in README.md:77-100 of the reference). Quirks deliberately FIXED
(SURVEY.md §5.6): --source-only and --level are real flags (the reference
hardcodes SOURCE_ONLY=True / LEVEL at module scope), --random-seed is
honored (the reference ignores it for a hardcoded 1338 — which stays the
default here), --warper is a proper boolean flag, and parsing happens in
main() instead of at import.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass


@dataclass
class TrainConfig:
    # Mode (reference module constants :24-25, exposed as flags).
    source_only: bool = True
    level: str = "single-level"
    model: str = "DeepLab"
    target: str = "cityscapes"

    # Data.
    source: str = "GTA5"  # GTA5 | Synscapes (reference README.md:53-55)
    batch_size: int = 1
    iter_size: int = 1
    num_workers: int = 4
    data_dir: str = "./data/GTA5"
    data_list: str = "./dataset/gta5_list/train.txt"
    data_dir_target: str = "./data/CityScapes"
    data_list_target: str = "./dataset/cityscapes_list/train.txt"
    ignore_label: int = 255
    input_size: str = "1024,512"          # W,H (torch crop_size order)
    input_size_target: str = "1024,512"
    set: str = "train"
    random_mirror: bool = False
    random_scale: bool = False

    # Optimization (:45-66).
    learning_rate: float = 2.5e-4
    momentum: float = 0.9
    weight_decay: float = 0.0005
    learning_rate_D: float = 1e-4
    power: float = 0.9
    num_steps: int = 250_000
    num_steps_stop: int = 150_000
    lambda_seg: float = 0.1
    lambda_adv_target1: float = 0.0002
    lambda_adv_target2: float = 0.001
    gan: str = "LS"

    # Model / restore.
    num_classes: int = 19
    restore_from: str = "DeepLab_resnet_pretrained_init-f81d91e8.pth"
    not_restore_last: bool = False
    warper: bool = True
    warper_norm: str = "Batch"  # Batch | Instance | Spectral
    # Encoder depth (reference warper.py:217 num_layers=8, x512 downsample;
    # needs H,W multiples of 256). Smaller values keep the same architecture
    # at tiny dryrun/test shapes (5 -> x32 latent downsample).
    warper_num_layers: int = 8

    # Bookkeeping.
    random_seed: int = 1338
    save_pred_every: int = 5000
    snapshot_dir: str = "./snapshots/"
    log_dir: str = "./log"
    tensorboard: bool = False
    save_num_images: int = 2

    # Device selection: reference --cpu flag (train_gta2cityscapes_multi.py
    # :92-93,189 `device = torch.device('cpu' if args.cpu else 'cuda')`).
    cpu: bool = False

    # Backbone BN dynamics. 'frozen' (default): normalize with the stored
    # running stats — checkpoint-faithful and BN-foldable (fast path; what
    # every released-checkpoint recipe needs at eval). 'batch': the
    # reference's literal train() dynamics — normalization by BATCH
    # statistics with frozen affine, running stats updating with torch
    # momentum 0.1 (train_gta2cityscapes_multi.py:222,
    # model/deeplab_multi.py:130-132). Use for bit-faithful from-scratch
    # training parity; at batch 1 the statistics are per-image.
    bn_mode: str = "frozen"

    # The reference's SGD param list duplicates every backbone param (once
    # per ancestor module — model/deeplab_multi.py:212-217 iterates
    # .modules() x .parameters()), and the torch-0.4 loop then applies the
    # momentum+update k times per step (stem x1, bottleneck convs x3,
    # downsample convs x4). False (default): one clean update per param,
    # the documented intent. True: mirror the literal 0.4 dynamics the
    # published curves were trained with (train/optim.py _kfold_trace).
    optim_dup_quirk: bool = False

    # TPU-native extras (no reference counterpart).
    num_devices: int = 0          # 0 = all local devices (data-parallel mesh)
    profile_dir: str = ""         # jax.profiler trace of a few steps
    compute_dtype: str = "float32"  # 'bfloat16' for speed
    orbax_checkpoints: bool = True  # full-state resume alongside .pth export

    @property
    def input_hw(self) -> tuple[int, int]:
        w, h = map(int, self.input_size.split(","))
        return (h, w)

    @property
    def input_hw_target(self) -> tuple[int, int]:
        w, h = map(int, self.input_size_target.split(","))
        return (h, w)

    @property
    def crop_size_wh(self) -> tuple[int, int]:
        w, h = map(int, self.input_size.split(","))
        return (w, h)

    @property
    def crop_size_wh_target(self) -> tuple[int, int]:
        w, h = map(int, self.input_size_target.split(","))
        return (w, h)


def _add_bool_flag(parser, name, default, help_):
    dest = name.replace("-", "_")
    parser.add_argument(
        f"--{name}", dest=dest, action="store_true", default=default, help=help_
    )
    parser.add_argument(f"--no-{name}", dest=dest, action="store_false")


def build_parser() -> argparse.ArgumentParser:
    d = TrainConfig()
    p = argparse.ArgumentParser(description="DeepLab-ResNet Network (TPU)")
    p.add_argument("--model", type=str, default=d.model,
                   help="available options : DeepLab / DeeplabVGG")
    p.add_argument("--target", type=str, default=d.target)
    p.add_argument("--source", type=str, default=d.source,
                   help="source domain dataset: GTA5 / Synscapes")
    p.add_argument("--batch-size", type=int, default=d.batch_size)
    p.add_argument("--iter-size", type=int, default=d.iter_size)
    p.add_argument("--num-workers", type=int, default=d.num_workers)
    p.add_argument("--data-dir", type=str, default=d.data_dir)
    p.add_argument("--data-list", type=str, default=d.data_list)
    p.add_argument("--ignore-label", type=int, default=d.ignore_label)
    p.add_argument("--input-size", type=str, default=d.input_size)
    p.add_argument("--data-dir-target", type=str, default=d.data_dir_target)
    p.add_argument("--data-list-target", type=str, default=d.data_list_target)
    p.add_argument("--input-size-target", type=str, default=d.input_size_target)
    p.add_argument("--learning-rate", type=float, default=d.learning_rate)
    p.add_argument("--learning-rate-D", type=float, default=d.learning_rate_D)
    p.add_argument("--lambda-seg", type=float, default=d.lambda_seg)
    p.add_argument("--lambda-adv-target1", type=float, default=d.lambda_adv_target1)
    p.add_argument("--lambda-adv-target2", type=float, default=d.lambda_adv_target2)
    p.add_argument("--momentum", type=float, default=d.momentum)
    _add_bool_flag(p, "not-restore-last", d.not_restore_last,
                   "Whether to not restore last (FC) layers.")
    p.add_argument("--num-classes", type=int, default=d.num_classes)
    p.add_argument("--num-steps", type=int, default=d.num_steps)
    p.add_argument("--num-steps-stop", type=int, default=d.num_steps_stop)
    p.add_argument("--power", type=float, default=d.power)
    _add_bool_flag(p, "random-mirror", d.random_mirror,
                   "Randomly mirror the inputs during the training.")
    _add_bool_flag(p, "random-scale", d.random_scale,
                   "Randomly scale the inputs during the training.")
    p.add_argument("--random-seed", type=int, default=d.random_seed)
    p.add_argument("--restore-from", type=str, default=d.restore_from)
    p.add_argument("--save-num-images", type=int, default=d.save_num_images)
    p.add_argument("--save-pred-every", type=int, default=d.save_pred_every)
    p.add_argument("--snapshot-dir", type=str, default=d.snapshot_dir)
    p.add_argument("--weight-decay", type=float, default=d.weight_decay)
    _add_bool_flag(p, "tensorboard", d.tensorboard, "Log scalars to tensorboard.")
    p.add_argument("--log-dir", type=str, default=d.log_dir)
    p.add_argument("--set", type=str, default=d.set)
    p.add_argument("--gan", type=str, default=d.gan,
                   help="choose the GAN objective: LS / Vanilla")
    p.add_argument("--level", type=str, default=d.level,
                   help="single-level/multi-level")
    _add_bool_flag(p, "source-only", d.source_only,
                   "Source-domain CE pretraining only (no adversarial).")
    _add_bool_flag(p, "warper", d.warper, "Enable the flow-field Warper.")
    p.add_argument("--warper-norm", type=str, default=d.warper_norm,
                   help="Warper norm layer: Batch / Instance / Spectral")
    p.add_argument("--warper-num-layers", type=int, default=d.warper_num_layers,
                   help="Warper encoder depth (reference default 8; smaller "
                        "for sub-256-multiple input sizes)")
    p.add_argument("--bn-mode", type=str, default=d.bn_mode,
                   choices=("frozen", "batch"),
                   help="backbone BN: frozen running stats (default) or the "
                        "reference's train-mode batch statistics")
    _add_bool_flag(p, "optim-dup-quirk", d.optim_dup_quirk,
                   "Mirror the reference's duplicate-param SGD dynamics "
                   "(k momentum+update applications per step for the "
                   "k-duplicated backbone params).")
    p.add_argument("--cpu", action="store_true", default=d.cpu,
                   help="choose to use cpu device.")
    p.add_argument("--num-devices", type=int, default=d.num_devices)
    p.add_argument("--profile-dir", type=str, default=d.profile_dir)
    p.add_argument("--compute-dtype", type=str, default=d.compute_dtype)
    _add_bool_flag(p, "orbax-checkpoints", d.orbax_checkpoints,
                   "Save full-state orbax checkpoints alongside .pth.")
    return p


def parse_args(argv=None) -> TrainConfig:
    ns = build_parser().parse_args(argv)
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    return TrainConfig(**{k: v for k, v in vars(ns).items() if k in fields})
