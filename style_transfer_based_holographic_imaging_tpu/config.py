"""Typed configuration for the whole framework.

The torch reference scatters its configuration across per-script argparse
namespaces (reference: test_field_retrieval_mnist.py:39-62) with train-only
fields appearing ad-hoc on classes (reference: utils/Forward_model.py:45,50).
Here everything lives in one tree of frozen dataclasses that serializes to
JSON alongside every run.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence


@dataclass(frozen=True)
class PhysicsConfig:
    """Optical constants of the imaging system.

    Defaults mirror the MNIST demo of the reference
    (test_field_retrieval_mnist.py:56-60): 532 nm laser, 1.5 µm pixels,
    distances carried in millimetres with identity normalization.
    """

    wavelength: float = 532e-9          # metres
    pixel_size: float = 1.5e-6          # metres
    phase_normalize: float = 1.0        # multiplier applied to phase maps
    distance_normalize: float = 1.0     # d_metres = (d + const) * normalize * 1e-3
    distance_normalize_constant: float = 0.0
    pad_factor: int = 2                 # replicate-pad factor inside ASM
    # Band-limited ASM (Matsushima & Shimobaba 2009): zero the transfer
    # function beyond f_lim = 1 / (lambda * sqrt((2 d / S)^2 + 1)) per axis
    # (S = padded aperture size). The reference never band-limits
    # (Angular_Spectrum_Method.py:22-23), which is fine at its sub-mm MNIST
    # distances but aliases at the experimental domains' 4-20 mm range
    # (alias-free limit ~ N*px^2/lambda ~ 1.1 mm at 256^2 / 1.5 um / 532 nm).
    band_limit: bool = False

    def to_metres(self, d):
        """De-normalize a distance (network units -> metres)."""
        return (d + self.distance_normalize_constant) * self.distance_normalize * 1e-3

    def to_network_units(self, d_mm):
        """Millimetres -> network distance units (inverse of ``to_metres``
        up to the mm/m factor). The single home for this conversion: a past
        release bug (style-distance refocus 10x off in streaming/serving)
        came from re-deriving it per call site."""
        return -self.distance_normalize_constant + d_mm / self.distance_normalize


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the style-transfer network."""

    image_size: int = 128
    width: float = 1.0                  # channel multiplier; 1.0 = reference-
                                        # exact VGG/decoder ("fast profile"
                                        # knob: 0.5 quarters the conv FLOPs)
    with_phase_decoder: bool = False    # dedicated decoder_ph head for the
                                        # phase plane (the reference ships
                                        # decoder_ph_iter_80000.pth.tar and
                                        # loads it, test_field_retrieval_
                                        # mnist.py:70-77, though its call is
                                        # commented at net.py:252)
    n_enc_layers: int = 4               # encoder taps relu1_1..relu4_1
    style_channels: int = 512           # channels at the deepest tap
    decoder_out_channels: int = 2       # [amplitude, phase]
    distance_hidden: int = 1024         # width of the distance MLP trunk
    disc_conv_dim: int = 64
    disc_repeat_num: int = 6
    disc_class_dim: int = 5
    dtype: str = "float32"              # compute dtype for the conv stack
    param_dtype: str = "float32"


@dataclass(frozen=True)
class DataConfig:
    """Hologram synthesis / dataset configuration."""

    batch_size: int = 8
    image_size: int = 128
    digit_pad: int = 32                 # 64x64 object padded to 128x128
    amplitude: float = 0.6              # constant object amplitude
    style_distances: Sequence[float] = (0.2,)           # mm (network units)
    content_distances: Sequence[float] = (0.4, 0.5, 0.6, 0.7, 0.8)
    translate_frac: float = 0.1         # random-translate augmentation
    flip: bool = True
    # Phase-object intensity augmentation: per-sample phase scale and gamma
    # jitter, compensating the blur/contrast gap between the bundled digit
    # bank and real MNIST digits. (1.0, 1.0) ranges disable it.
    phase_scale_range: Sequence[float] = (0.7, 1.0)
    gamma_range: Sequence[float] = (0.6, 1.6)
    # Shape-diversity augmentation (rotation + smooth elastic warp of the
    # phase object). Round-1 post-mortem (docs/QUALITY.md): the distance
    # head confounds unseen glyph SHAPE with the distance cue — warping
    # multiplies the shape distribution of a small bank. 0/0.0 = off
    # (reference parity: its transforms are flip/translate only,
    # Data_loader.py:11-12).
    rotate_deg: float = 0.0             # per-sample rotation, uniform +/- deg
    elastic_px: float = 0.0             # elastic displacement amplitude (px)
    elastic_cells: int = 8              # control-grid resolution of the warp
    seed: int = 0


@dataclass(frozen=True)
class TrainConfig:
    """Optimization settings for minting checkpoints."""

    iterations: int = 20000
    lr: float = 1e-4
    lr_decay: float = 5e-5
    lr_schedule: str = "invtime"         # 'invtime' | 'cosine'
    grad_clip_norm: float = 1.0          # global-norm gradient clip; 0 disables.
    # ^ converged minting runs were observed to be destroyed by single-step
    # loss spikes (rbc run: distance loss 1e-4 at 9k, spike at 11.6k, final
    # checkpoint mid-recovery); clipping bounds the damage a rare huge
    # gradient can do.
    content_weight: float = 1.0
    style_weight: float = 10.0
    physics_weight: float = 10.0
    distance_weight: float = 10.0
    supervised_weight: float = 10.0      # direct field supervision (synthetic data)
    perceptual_weight: float = 0.0       # VGG-feature (encoder-tap) supervised
                                         # loss on the style-plane phase; the
                                         # feature extractor's params are
                                         # stop-gradded so a trainable encoder
                                         # cannot collapse to zero the term
    tv_weight: float = 0.0
    adv_weight: float = 0.0              # PatchGAN adversarial term
    use_dropout: bool = False
    # ^ train-time dropout in the distance MLP. The reference trains with
    # Dropout(0.5) (net.py:271-303), but its Dropout -> InstanceNorm stack
    # behaves very differently with dropout on vs off: a head trained
    # stochastic scores R^2 ~0.99 in train mode yet ~-0.3 in eval mode on
    # the SAME data (measured). With an infinite synthesized stream there is
    # nothing to regularize, so the default trains deterministically.
    checkpoint_every: int = 5000
    log_every: int = 100
    checkpoint_dir: str = "checkpoints"
    dp_axis: str = "data"               # mesh axis name for batch data-parallel
    remat: bool = False                 # jax.checkpoint the network forward:
                                        # recompute activations in backward,
                                        # ~1/3 extra FLOPs for O(1) activation
                                        # memory (combine with grad_accum for
                                        # very large effective batches)
    grad_accum: int = 1                 # micro-batches per optimizer step: the
                                        # batch is split in grad_accum equal
                                        # chunks scanned on-device (summed
                                        # grads / k == full-batch grads — all
                                        # losses are per-sample means), trading
                                        # step latency for activation memory
    freeze_encoder: bool = True         # reference semantics (net.py:167-170);
                                        # False lets the encoder train too
                                        # (useful when no pretrained VGG
                                        # weights exist, as in this snapshot)
    ema_decay: float = 0.0              # Polyak averaging of the generator
                                        # params (ema = d*ema + (1-d)*params
                                        # each step; 0 disables). Insurance
                                        # against exactly the rbc post-mortem
                                        # failure mode: a late loss spike
                                        # leaving the final checkpoint
                                        # mid-recovery — the averaged weights
                                        # ride through the spike.
    tensorboard_dir: str = ""           # also mirror the per-log-step scalars
                                        # to a TensorBoard event dir (the
                                        # reference pins tensorboardX for this
                                        # role, requirements.txt:6). "" = off;
                                        # JSONL in checkpoint_dir stays the
                                        # always-on structured sink.


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation / reporting settings."""

    save_dir: str = "output"
    exp_name: str = "MNIST_test"
    save_ext: str = ".png"
    alpha: float = 1.0
    unknown_distance: bool = True
    save_montages: bool = True
    report_jsonl: bool = True


@dataclass(frozen=True)
class ExperimentConfig:
    """Top-level bundle, one per run."""

    name: str = "mnist"
    physics: PhysicsConfig = field(default_factory=PhysicsConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "ExperimentConfig":
        def build(tp, sub):
            if sub is None:
                return tp()
            names = {f.name for f in dataclasses.fields(tp)}
            # JSON round-trips tuples as lists; these frozen configs are used
            # as static jit arguments, so sequence fields must come back
            # hashable (tuples).
            return tp(
                **{
                    k: tuple(v) if isinstance(v, list) else v
                    for k, v in sub.items()
                    if k in names
                }
            )

        return cls(
            name=d.get("name", "mnist"),
            physics=build(PhysicsConfig, d.get("physics")),
            model=build(ModelConfig, d.get("model")),
            data=build(DataConfig, d.get("data")),
            train=build(TrainConfig, d.get("train")),
            eval=build(EvalConfig, d.get("eval")),
        )

    @classmethod
    def from_json(cls, s: str) -> "ExperimentConfig":
        return cls.from_dict(json.loads(s))


# ---------------------------------------------------------------------------
# Canonical experiment presets (the reference's three style domains).
# ---------------------------------------------------------------------------

def mnist_config() -> ExperimentConfig:
    """The bundled MNIST demo (reference: test_field_retrieval_mnist.py defaults)."""
    return ExperimentConfig(name="mnist")


def polystyrene_config() -> ExperimentConfig:
    """Polystyrene-bead experimental domain (distances parsed from .mat trees,
    reference: utils/Data_loader.py:89-102)."""
    return ExperimentConfig(
        name="polystyrene_bead",
        # distance_normalize maps the 5-20 mm range into the sigmoid head's
        # (0, 1) output (the MNIST demo uses 1.0 because its distances are
        # already sub-millimetre, test_field_retrieval_mnist.py:58-60).
        # band_limit: 5-20 mm is far past the sampled transfer function's
        # alias-free range (~1.1 mm here) — see PhysicsConfig.band_limit.
        physics=PhysicsConfig(distance_normalize=25.0, band_limit=True),
        data=DataConfig(
            style_distances=(8.0,),
            content_distances=tuple(float(d) for d in range(5, 21)),
        ),
    )


def red_blood_cell_config() -> ExperimentConfig:
    """Red-blood-cell streaming domain (reference: utils/Data_loader.py:104-116)."""
    return ExperimentConfig(
        name="red_blood_cell",
        physics=PhysicsConfig(distance_normalize=10.0, band_limit=True),
        data=DataConfig(
            style_distances=(6.0,),
            content_distances=(4.0, 5.0, 6.0, 7.0, 8.0),
        ),
    )


DOMAIN_PRESETS = {
    "mnist": mnist_config,
    "polystyrene": polystyrene_config,
    "polystyrene_bead": polystyrene_config,
    "tissue": polystyrene_config,
    "red_blood_cell": red_blood_cell_config,
    "rbc": red_blood_cell_config,
}
