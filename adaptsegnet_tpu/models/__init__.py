"""Model zoo: DeepLab-v2 segmenters, FC discriminator, Warper."""

from adaptsegnet_tpu.models.deeplab_resnet import (
    Bottleneck,
    ClassifierModule,
    ResNetBackbone,
    DeeplabMulti,
    DeeplabSingle,
)
from adaptsegnet_tpu.models.deeplab_vgg import DeeplabVGG
from adaptsegnet_tpu.models.discriminator import FCDiscriminator
from adaptsegnet_tpu.models.warper import Warper

__all__ = [
    "Bottleneck",
    "ClassifierModule",
    "ResNetBackbone",
    "DeeplabMulti",
    "DeeplabSingle",
    "DeeplabVGG",
    "FCDiscriminator",
    "Warper",
]
