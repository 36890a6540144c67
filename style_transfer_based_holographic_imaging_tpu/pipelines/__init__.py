"""End-to-end pipelines: retrieval, evaluation, streaming."""

from style_transfer_based_holographic_imaging_tpu.pipelines.field_retrieval import (
    retrieval_step,
    make_retrieval_fn,
    evaluate_golden_suite,
)
from style_transfer_based_holographic_imaging_tpu.pipelines.stylize import stylize
from style_transfer_based_holographic_imaging_tpu.pipelines.domain_eval import (
    evaluate_synth_domain,
)
from style_transfer_based_holographic_imaging_tpu.pipelines.autofocus import (
    autofocus,
    sharpness,
)
from style_transfer_based_holographic_imaging_tpu.pipelines.export_artifact import (
    ArtifactRetrieval,
    export_retrieval,
    load_artifact,
    save_artifact,
)

__all__ = [
    "retrieval_step",
    "make_retrieval_fn",
    "evaluate_golden_suite",
    "evaluate_synth_domain",
    "stylize",
    "autofocus",
    "sharpness",
    "export_retrieval",
    "save_artifact",
    "load_artifact",
    "ArtifactRetrieval",
]
