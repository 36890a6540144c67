"""Model zoo: flax.linen networks of the framework."""

from style_transfer_based_holographic_imaging_tpu.models.vgg import VggEncoder
from style_transfer_based_holographic_imaging_tpu.models.decoder import AmpPhaseDecoder
from style_transfer_based_holographic_imaging_tpu.models.distance import DistanceMLP
from style_transfer_based_holographic_imaging_tpu.models.discriminator import (
    PatchDiscriminator,
)
from style_transfer_based_holographic_imaging_tpu.models.net import (
    StyleTransferNet,
    split_style_vector,
    init_net_params,
)
from style_transfer_based_holographic_imaging_tpu.models.ablations import (
    HoloAutoEncoder,
    TrivialSolutionNet,
    ECALayer,
)

__all__ = [
    "HoloAutoEncoder",
    "TrivialSolutionNet",
    "ECALayer",
    "VggEncoder",
    "AmpPhaseDecoder",
    "DistanceMLP",
    "PatchDiscriminator",
    "StyleTransferNet",
    "split_style_vector",
    "init_net_params",
]
