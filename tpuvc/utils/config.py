"""Two-tier config system mirroring the reference's shape (SURVEY.md SS5.6).

The reference drives everything from an ``architecture-vawgan-vcc2016.json``
file (layer specs + training block) plus CLI flags; model/trainer classes are
chosen dynamically by string name.  We keep the same two tiers — CLI flags +
one JSON — but resolve names through explicit registry dicts
(``tpuvc.models.vae.make_model``, ``tpuvc.train.trainer.TRAINERS``) instead
of importlib strings.

The JSON schema accepted here is a superset of the reference's (reconstructed;
the reference mount was empty — SURVEY.md provenance note): per-net
``kernel`` / ``stride`` / ``output`` lists, ``z_dim``, ``y_dim``, and a
``training`` block with ``batch_size``, ``lr``, ``epoch``, ``alpha``,
``lambda`` (gradient penalty), ``n_unroll``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass(frozen=True)
class NetSpec:
    """Conv stack spec: per-layer kernel length (freq axis), stride, width."""

    kernel: tuple[int, ...]
    stride: tuple[int, ...]
    output: tuple[int, ...]

    def __post_init__(self):
        if not (len(self.kernel) == len(self.stride) == len(self.output)):
            raise ValueError("kernel/stride/output must have equal length")

    @staticmethod
    def from_json(d: dict[str, Any]) -> "NetSpec":
        def flat(v):
            # accept reference-style [[7,1],[7,1],...] or flat [7,7,...]
            return tuple(k[0] if isinstance(k, (list, tuple)) else k for k in v)
        return NetSpec(kernel=flat(d["kernel"]), stride=flat(d["stride"]),
                       output=tuple(d["output"]))


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 256
    lr: float = 1e-4
    beta1: float = 0.5
    beta2: float = 0.9
    epoch: int = 200
    alpha: float = 50.0          # adversarial weight in the generator loss
    gp_lambda: float = 10.0      # WGAN gradient penalty
    n_unroll: int = 5            # critic steps per generator step
    summary_freq: int = 100
    save_freq: int = 10000
    num_frames_per_epoch: int = 500_000  # VCC2016 training-set scale

    @staticmethod
    def from_json(d: dict[str, Any]) -> "TrainConfig":
        return TrainConfig(
            batch_size=int(d.get("batch_size", 256)),
            lr=float(d.get("lr", 1e-4)),
            beta1=float(d.get("beta1", 0.5)),
            beta2=float(d.get("beta2", 0.9)),
            epoch=int(d.get("epoch", 200)),
            alpha=float(d.get("alpha", 50.0)),
            gp_lambda=float(d.get("lambda", d.get("gp_lambda", 10.0))),
            n_unroll=int(d.get("n_unroll", 5)),
            summary_freq=int(d.get("summary_freq", 100)),
            save_freq=int(d.get("save_freq", 10000)),
            num_frames_per_epoch=int(d.get("num_frames_per_epoch", 500_000)),
        )


@dataclasses.dataclass(frozen=True)
class Architecture:
    """Full model architecture (reference architecture-*.json equivalent)."""

    model: str = "VAWGAN"                 # registry key: "VAE" | "VAWGAN"
    trainer: str = "VAWGANTrainer"
    x_dim: int = 513
    z_dim: int = 128
    y_dim: int = 10                       # number of speakers
    y_emb_dim: int = 128
    encoder: NetSpec = NetSpec((7, 7, 7, 7, 7), (3, 3, 3, 3, 3),
                               (16, 32, 64, 128, 256))
    # upsampling strides compose to 27 = 513/19 (see models/vae.py Decoder)
    generator: NetSpec = NetSpec((7, 7, 7, 7, 7), (3, 3, 3, 1, 1),
                                 (128, 64, 32, 16, 1))
    discriminator: NetSpec = NetSpec((7, 7, 7), (3, 3, 3), (16, 32, 64))
    d_conditional: bool = True            # speaker-condition the critic
    #   (SURVEY.md SS2.1 writes `_discriminate(x, y?)` — an explicitly
    #   open parity question, settled by data in round 5: the projection-
    #   conditioned critic wins the 30k-step resident A/B on every axis
    #   (MCD 5.249 vs 5.638 dB, DTW-MCD 3.896 vs 4.202, GV ratio +0.08 vs
    #   -0.79 dB — it closes the over-smoothing gap the uncond critic
    #   only halved; scale_validation.json "critic_conditioning_ab").
    #   False remains the uncond ablation arm; legacy architecture.json
    #   files without the field load as False (from_json gate below).
    output_activation: str = "tanh"       # decoder's final nonlinearity:
    #   "tanh" bounds the generated frame to the Tanhize range [-1, 1]
    #   (the reference generator ends in a tanh-ranged normalized log-SP
    #   frame, SURVEY.md SS3.4); "linear" is the unbounded ablation arm.
    #   Either way conversion clips u before de-normalization
    #   (convert/pipeline._denormalize_sp), so OOD decoder output can
    #   never extrapolate log-SP past the corpus max and blow up
    #   synthesis power.  Chosen on evidence: see scale_validation.json
    #   "output_activation_ab" (30k-step resident A/B).
    lrelu_slope: float = 0.2
    compute_dtype: str = "float32"        # "bfloat16" for TPU inference
    conv_impl: str = "xla"                # "pallas": fused conv+LN+lrelu
    #   kernels on TPU (interpreter-mode elsewhere; parameter tree differs
    #   from the xla impl, so pick per run, not per checkpoint)
    d2s_impl: str = "xla"                 # "pallas": fused depth-to-space
    #   + LN + lrelu in the decoder's subpixel layers (ops/pallas_d2s.py;
    #   LN parameter names differ from the xla impl, so pick per run).
    #   UNSUPPORTED on TPU hardware: Mosaic rejects the kernel's stores
    #   (docs/PERFORMANCE.md item 5) — make_model fails fast there; the
    #   kernel remains an interpreter-mode test artifact.
    training: TrainConfig = TrainConfig()

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Architecture":
        kw: dict[str, Any] = {}
        for key in ("model", "trainer", "x_dim", "z_dim", "y_dim", "y_emb_dim",
                    "d_conditional", "output_activation", "lrelu_slope",
                    "compute_dtype", "conv_impl", "d2s_impl"):
            if key in d:
                kw[key] = d[key]
        # version gate: an architecture.json WITHOUT output_activation
        # predates the tanh head — its checkpoint was trained with a
        # linear decoder, and applying tanh at load would silently
        # compress every frame (tanh(0.9) = 0.716).  New runs save the
        # field (Architecture.save serializes all fields), so only
        # legacy checkpoints take this branch.
        kw.setdefault("output_activation", "linear")
        # same gate for the critic's conditioning (round-5 default flip):
        # an architecture.json WITHOUT d_conditional predates the flip —
        # its checkpoint's critic tree has no projection params, so it
        # must keep loading as the unconditioned critic.  New runs save
        # the field.
        kw.setdefault("d_conditional", False)
        # reference alias: "hwc": [513, 1, 1]
        if "hwc" in d:
            kw["x_dim"] = int(d["hwc"][0])
        for net in ("encoder", "generator", "discriminator"):
            if net in d:
                kw[net] = NetSpec.from_json(d[net])
        if "training" in d:
            kw["training"] = TrainConfig.from_json(d["training"])
        return Architecture(**kw)

    @staticmethod
    def load(path: str) -> "Architecture":
        with open(path) as f:
            return Architecture.from_json(json.load(f))

    def to_json(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        for net in ("encoder", "generator", "discriminator"):
            d[net] = {k: list(v) for k, v in d[net].items()}
        return d

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_json(), f, indent=2)


def load_architecture(path: str) -> Architecture:
    return Architecture.load(path)
