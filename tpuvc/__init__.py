"""tpuvc — TPU-native non-parallel voice conversion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``JeremyCCHsu/vae-npvc`` reference (VAE-VC, Hsu et al. APSIPA 2016; VAW-GAN,
Hsu et al. Interspeech 2017): WORLD-style analysis/synthesis implemented as
batched jit-compiled device code, a speaker-conditioned convolutional VAE and
Wasserstein-GAN critic as Flax modules, and an end-to-end conversion graph
(analyze -> encode -> speaker-swap decode -> synthesize) compiled as a single
device program.

Layout (see SURVEY.md for the reference layer map this mirrors):
  dsp/      WORLD-equivalent analysis + synthesis (reference: analyzer.py + pyworld C++)
  io/       WAV + frame-record I/O (reference: analyzer.py record writer)
  data/     normalizer / stats / input pipeline (reference: Tanhize + TF queues)
  models/   Flax VAE + VAWGAN (reference: model/vae.py)
  ops/      Pallas TPU kernels for the hot paths
  parallel/ mesh + sharding helpers (reference has none; see SURVEY.md SS2.4)
  train/    trainers + checkpointing (reference: trainer/{vae,vawgan}.py)
  convert/  end-to-end conversion pipeline (reference: convert.py)
  cli/      analyze / train / convert entry points (reference: analyzer.py, main.py, convert.py)
  utils/    config, logdir, metrics (reference: util/wrapper.py, util/image.py)
"""

__version__ = "0.1.0"

_EXPORTS = {
    "analyze": ("tpuvc.dsp.world", "analyze"),
    "analyze_batch": ("tpuvc.dsp.world", "analyze_batch"),
    "synthesize": ("tpuvc.dsp.synthesis", "synthesize"),
    "dio": ("tpuvc.dsp.dio", "dio"),
    "harvest": ("tpuvc.dsp.harvest", "harvest"),
    "stonemask": ("tpuvc.dsp.stonemask", "stonemask"),
    "cheaptrick": ("tpuvc.dsp.cheaptrick", "cheaptrick"),
    "d4c": ("tpuvc.dsp.d4c", "d4c"),
    "WorldConfig": ("tpuvc.dsp.constants", "WorldConfig"),
    "Converter": ("tpuvc.convert.pipeline", "Converter"),
    "StreamingConverter": ("tpuvc.convert.streaming", "StreamingConverter"),
    "MultiStreamConverter": ("tpuvc.convert.streaming",
                             "MultiStreamConverter"),
    "resample": ("tpuvc.io.wav", "resample"),
    "Architecture": ("tpuvc.utils.config", "Architecture"),
    "make_model": ("tpuvc.models.vae", "make_model"),
    "make_trainer": ("tpuvc.train.trainer", "make_trainer"),
}


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package import time)."""
    if name in _EXPORTS:
        import importlib
        module, attr = _EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'tpuvc' has no attribute {name!r}")
