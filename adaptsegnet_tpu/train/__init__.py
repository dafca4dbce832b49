"""Training: schedules, optimizers, fused pjit train steps, loop."""

from adaptsegnet_tpu.train.schedule import lr_poly
from adaptsegnet_tpu.train.optim import (
    make_generator_tx,
    make_discriminator_tx,
    generator_param_labels,
)
from adaptsegnet_tpu.train.state import GeneratorState, DiscriminatorState, TrainState

__all__ = [
    "lr_poly",
    "make_generator_tx",
    "make_discriminator_tx",
    "generator_param_labels",
    "GeneratorState",
    "DiscriminatorState",
    "TrainState",
]
