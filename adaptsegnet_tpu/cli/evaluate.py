"""`python evaluate_cityscapes.py <flags>` — Cityscapes val inference.

Reference CLI surface (evaluate_cityscapes.py:62-93). Iterates snapshots
(num_steps_stop / save_pred_every, reference :125) or evaluates a single
--restore-from checkpoint, writing raw-id + palette PNGs per image under
<save>/<mode>/step<k>/.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np

from adaptsegnet_tpu.data import CityscapesDataset
from adaptsegnet_tpu.eval.evaluator import Evaluator
from adaptsegnet_tpu.models import DeeplabMulti, DeeplabSingle, DeeplabVGG
from adaptsegnet_tpu.utils import pth_interop


def get_arguments(argv=None):
    p = argparse.ArgumentParser(description="DeepLab-ResNet Network (TPU eval)")
    p.add_argument("--model", type=str, default="DeeplabMulti",
                   help="Model Choice (DeeplabMulti/DeeplabVGG/Oracle).")
    p.add_argument("--data-dir", type=str, default="./data/CityScapes")
    p.add_argument("--data-list", type=str,
                   default="./dataset/cityscapes_list/val.txt")
    p.add_argument("--ignore-label", type=int, default=255)
    p.add_argument("--num-classes", type=int, default=19)
    p.add_argument("--restore-from", type=str, default="",
                   help="Evaluate one checkpoint instead of the snapshot loop.")
    p.add_argument("--set", type=str, default="val")
    p.add_argument("--save", type=str, default="./result/cityscapes")
    p.add_argument("--save-pred-every", type=int, default=5000)
    p.add_argument("--num-steps-stop", type=int, default=150000)
    p.add_argument("--level", type=str, default="single-level")
    p.add_argument("--source-only", dest="source_only", action="store_true",
                   default=True)
    p.add_argument("--no-source-only", dest="source_only", action="store_false")
    p.add_argument("--snapshot-dir", type=str, default="./snapshots")
    p.add_argument("--input-size", type=str, default="1024,512",
                   help="W,H network input (reference fwd at 512x1024).")
    p.add_argument("--output-size", type=str, default="2048,1024",
                   help="W,H of the upsampled prediction (reference :153).")
    p.add_argument("--aspp-sum", type=str, default="")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-devices", type=int, default=1,
                   help="Shard the eval batch over a data-parallel mesh of "
                        "this many devices (the reference DataParallels "
                        "eval by default, evaluate_cityscapes.py:92,145); "
                        "batch-size must be a multiple. 0 = all devices.")
    p.add_argument("--cpu", action="store_true",
                   help="choose to use cpu device.")
    return p.parse_args(argv)


def build_model(args):
    if args.model == "DeeplabMulti":
        model = DeeplabMulti(num_classes=args.num_classes)
        output_index, loader = 1, pth_interop.resnet_state_dict_to_variables
    elif args.model == "Oracle":
        model = DeeplabSingle(
            num_classes=args.num_classes,
            aspp_sum=args.aspp_sum or "first2",
        )
        output_index, loader = None, pth_interop.resnet_state_dict_to_variables
    elif args.model == "DeeplabVGG":
        model = DeeplabVGG(
            num_classes=args.num_classes, aspp_sum=args.aspp_sum or "first2"
        )
        output_index, loader = None, pth_interop.vgg_state_dict_to_variables
    else:
        raise NotImplementedError(args.model)
    return model, output_index, loader


def load_variables(model, loader, path, num_classes):
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1338), jnp.zeros((1, 64, 64, 3))
    )
    sd = pth_interop.load_torch_state_dict(path)
    partial = loader(sd)
    return pth_interop.merge_variables(variables, partial)


def _mode_subdir(args) -> str:
    if args.source_only:
        return "source_only"
    return {"single-level": "single_level", "multi-level": "multi_level"}[
        args.level
    ]


def evaluate_checkpoint(args, model, output_index, loader, ckpt_path, save_dir):
    variables = load_variables(model, loader, ckpt_path, args.num_classes)
    ow, oh = map(int, args.output_size.split(","))
    mesh = None
    if args.num_devices != 1:
        from adaptsegnet_tpu.parallel import make_mesh

        mesh = make_mesh(args.num_devices)
    # Single-output models (Oracle/VGG) return a bare array; make_eval_fn
    # only indexes tuple outputs, so output_index is ignored there.
    evaluator = Evaluator(
        model, out_hw=(oh, ow),
        output_index=output_index if output_index is not None else 0,
        save_dir=save_dir, mesh=mesh,
    )
    w, h = map(int, args.input_size.split(","))
    ds = CityscapesDataset(
        args.data_dir, args.data_list, crop_size=(w, h), set=args.set
    )
    return evaluator.run(variables, ds, batch_size=args.batch_size)


def main(argv=None):
    args = get_arguments(argv)
    if args.cpu:
        # Reference --cpu (evaluate_cityscapes.py:85,143). Only effective
        # before first backend use (platform selection is process-wide).
        jax.config.update("jax_platforms", "cpu")
        if jax.devices()[0].platform != "cpu":
            # Operator-facing: the CLIs configure no logging handler, so a
            # module-logger warning would be silently dropped (advisor r3).
            print(
                f"WARNING: --cpu requested but the "
                f"{jax.devices()[0].platform} backend is already "
                "initialized; continuing on it",
                file=sys.stderr,
            )
    from adaptsegnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    os.makedirs(args.save, exist_ok=True)
    model, output_index, loader = build_model(args)

    if args.restore_from:
        ckpts = [(None, args.restore_from)]
    else:
        ckpts = []
        for files in range(int(args.num_steps_stop / args.save_pred_every)):
            step = (files + 1) * args.save_pred_every
            ckpts.append(
                (step,
                 osp.join(args.snapshot_dir, _mode_subdir(args),
                          f"GTA5_{step}.pth"))
            )

    for step, path in ckpts:
        if step is not None:
            print("Step: ", step)
        if not osp.exists(path):
            print(f"missing snapshot {path}; skipping")
            continue
        sub = (osp.join(args.save, _mode_subdir(args), f"step{step}")
               if step is not None else args.save)
        evaluate_checkpoint(args, model, output_index, loader, path, sub)


if __name__ == "__main__":
    main()
