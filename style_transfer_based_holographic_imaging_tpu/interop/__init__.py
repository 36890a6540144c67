"""Torch interop: checkpoint and tensor converters."""

from style_transfer_based_holographic_imaging_tpu.interop.torch_weights import (
    load_torch_tensor,
    torch_to_numpy,
    convert_conv_kernel,
    convert_vgg_state_dict,
    convert_decoder_state_dict,
    convert_distance_state_dict,
    load_style_vector,
    save_style_vector_pt,
)

__all__ = [
    "load_torch_tensor",
    "torch_to_numpy",
    "convert_conv_kernel",
    "convert_vgg_state_dict",
    "convert_decoder_state_dict",
    "convert_distance_state_dict",
    "load_style_vector",
    "save_style_vector_pt",
]
