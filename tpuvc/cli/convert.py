"""Conversion CLI (the reference's ``python convert.py``).

  python -m tpuvc.cli.convert --src SF1 --trg TM3 \
      --checkpoint logdir/train/<ts> --corpus dataset/vcc2016 \
      [--file_pattern "*.wav"] [--output DIR] [--split test]

Loads the run's architecture + latest checkpoint, then converts every
matching source-speaker utterance through the single-graph pipeline
(analyze -> encode -> speaker-swap decode -> f0 transform -> synthesize)
and writes <output>/<trg>-<utt>.wav, mirroring the reference's flags and
output convention (convert.py, SURVEY.md SS3.3).
"""

from __future__ import annotations

import argparse
import fnmatch
import os

from tpuvc.cli.common import add_platform_flag, apply_platform


def load_converter(checkpoint_dir: str, corpus_root: str,
                   f0_method: str = "dio", ap_method: str = "group_delay",
                   transfer_encoding: str = "float32",
                   harvest_decim: int = 1):
    """Build a Converter from a training run dir + corpus etc/ stats."""
    import jax

    from tpuvc.convert.pipeline import Converter, ConverterAssets
    from tpuvc.io import corpus as corpus_io
    from tpuvc.models.vae import make_model
    from tpuvc.train import steps as steps_lib
    from tpuvc.train.checkpoint import Checkpointer
    from tpuvc.utils.config import Architecture

    arch = Architecture.load(os.path.join(checkpoint_dir,
                                          "architecture.json"))
    model = make_model(arch)
    rng = jax.random.PRNGKey(0)
    if arch.model == "VAWGAN":
        template = steps_lib.init_vawgan_state(model, arch, rng)
    else:
        template = steps_lib.init_vae_state(model, arch, rng)
    ckpt = Checkpointer(os.path.join(checkpoint_dir, "ckpt"))
    restored = ckpt.restore_latest(jax.device_get(template))
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}/ckpt")
    state, step = restored

    etc = os.path.join(corpus_root, "etc")
    xmin, xmax = corpus_io.load_norm_stats(etc)
    mu, sigma = corpus_io.load_f0_stats(etc)
    speakers = corpus_io.read_speakers(etc)
    assets = ConverterAssets(xmin=xmin, xmax=xmax, f0_mu=mu, f0_sigma=sigma,
                             speakers=speakers)
    import dataclasses as _dc

    from tpuvc.dsp.constants import DEFAULT_WORLD
    cfg = _dc.replace(DEFAULT_WORLD, f0_method=f0_method,
                      ap_method=ap_method,
                      harvest_channel_decim=harvest_decim)
    return Converter(model, state.params, assets, cfg=cfg,
                     transfer_encoding=transfer_encoding), step


def main(argv: list[str] | None = None) -> list[str]:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", default=None)
    p.add_argument("--trg", default=None)
    p.add_argument("--all_pairs", action="store_true",
                   help="convert every source speaker's utterances to every "
                        "other speaker in batched device calls (BASELINE "
                        "config 4); ignores --src/--trg")
    p.add_argument("--checkpoint", required=True,
                   help="training run directory (logdir/train/<ts>)")
    p.add_argument("--corpus", required=True)
    p.add_argument("--file_pattern", default="*.wav")
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--output", default=None,
                   help="default: <checkpoint>/converted")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_spectrogram", action="store_true",
                   help="also write a jet spectrogram PNG per converted wav "
                        "(reference util/image.py summaries)")
    p.add_argument("--streaming", action="store_true",
                   help="convert through the chunked streaming path "
                        "(fixed compile, bounded latency; convert/streaming"
                        ".py) instead of whole-utterance graphs")
    p.add_argument("--chunk_s", type=float, default=1.0,
                   help="streaming chunk seconds (with --streaming)")
    p.add_argument("--f0-method", default="dio", choices=["dio", "harvest"],
                   help="f0 estimator inside the conversion graph (match "
                        "what cli.analyze used for the corpus stats)")
    p.add_argument("--ap-method", default="group_delay",
                   choices=["group_delay", "nccf"])
    p.add_argument("--harvest-decim", type=int, default=1,
                   help="harvest fast mode: candidate filterbank at "
                        "1/(40/decim)-octave spacing (2 ~halves the two "
                        "dominant harvest stages; accuracy cost measured "
                        "small — tests/test_f0.py); 1 = exact WORLD layout")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batched (--all_pairs) conversion over all "
                        "local devices (DP serving, SURVEY.md SS2.4)")
    p.add_argument("--transfer-encoding", default="float32",
                   choices=["float32", "ulaw8", "pcm12"],
                   help="device->host waveform encoding for bandwidth-"
                        "limited attachments (ops/ulaw.py): ulaw8 = 8-bit "
                        "mu-law (~4x smaller, ~37 dB SNR), pcm12 = packed "
                        "12-bit PCM (~2.7x smaller, ~61 dB SNR); written "
                        "WAVs are 16-bit either way")
    add_platform_flag(p)
    args = p.parse_args(argv)
    apply_platform(args)

    from tpuvc.io import corpus as corpus_io
    from tpuvc.io.wav import read_wav, write_wav

    converter, step = load_converter(args.checkpoint, args.corpus,
                                     args.f0_method, args.ap_method,
                                     args.transfer_encoding,
                                     args.harvest_decim)
    split = (corpus_io.TEST_SPLIT if args.split == "test"
             else corpus_io.TRAIN_SPLIT)
    out_dir = args.output or os.path.join(args.checkpoint, "converted")
    os.makedirs(out_dir, exist_ok=True)

    if args.all_pairs:
        speakers = converter.assets.speakers
        xs, srcs, trgs, names = [], [], [], []
        for src in speakers:
            for w in corpus_io.list_wavs(args.corpus, split, src):
                if not fnmatch.fnmatch(os.path.basename(w),
                                       args.file_pattern):
                    continue
                x, fs = read_wav(w, target_fs=converter.cfg.fs)
                utt = os.path.splitext(os.path.basename(w))[0]
                for trg in speakers:
                    if trg == src:
                        continue
                    xs.append(x)
                    srcs.append(src)
                    trgs.append(trg)
                    names.append(f"{src}-to-{trg}-{utt}.wav")
        outputs = []
        mesh = None
        if args.data_parallel:
            from tpuvc.parallel import mesh as mesh_lib
            mesh = mesh_lib.make_mesh()
        ys = converter.convert_batch(xs, srcs, trgs, seed=args.seed,
                                     mesh=mesh)
        for name, y in zip(names, ys):
            out = os.path.join(out_dir, name)
            write_wav(out, y, converter.cfg.fs)
            outputs.append(out)
        print(f"[convert] step{step} all-pairs: {len(outputs)} conversions "
              f"({len(set(srcs))} speakers) -> {out_dir}")
        return outputs

    if not args.src or not args.trg:
        p.error("--src and --trg are required unless --all_pairs is set")
    wavs = [w for w in corpus_io.list_wavs(args.corpus, split, args.src)
            if fnmatch.fnmatch(os.path.basename(w), args.file_pattern)]
    if not wavs:
        raise FileNotFoundError(
            f"no wavs for speaker {args.src} in split {split!r}")
    outputs = []
    streamer = None
    if args.streaming:
        from tpuvc.convert.streaming import StreamingConverter
        streamer = lambda x: _stream_one(converter, x, args)  # noqa: E731
    for w in wavs:
        x, fs = read_wav(w, target_fs=converter.cfg.fs)
        if streamer is not None:
            y = streamer(x)
        else:
            y = converter.convert(x, args.src, args.trg, seed=args.seed)
        out = os.path.join(
            out_dir, f"{args.trg}-{os.path.splitext(os.path.basename(w))[0]}"
                     ".wav")
        write_wav(out, y, converter.cfg.fs)
        if args.save_spectrogram:
            _save_spectrogram_png(out, y, fs)
        outputs.append(out)
        print(f"[convert] step{step} {args.src}->{args.trg} "
              f"{os.path.basename(w)} -> {out}")
    return outputs


def _stream_one(converter, x, args):
    import numpy as np

    from tpuvc.convert.streaming import StreamingConverter
    s = StreamingConverter(converter, args.src, args.trg,
                           chunk_s=args.chunk_s, seed=args.seed)
    return np.concatenate([s.push(x), s.flush()])


def _save_spectrogram_png(wav_path: str, y, fs: int) -> None:
    import numpy as np

    from tpuvc.data.analyze_corpus import analyze_utterance
    from tpuvc.dsp.constants import DEFAULT_WORLD
    from tpuvc.utils.image import spectrogram_image
    try:
        from matplotlib import image as mpimg
    except Exception:
        return
    _, sp, _ = analyze_utterance(np.asarray(y, np.float64), DEFAULT_WORLD)
    img = spectrogram_image(sp, log_input=True)
    mpimg.imsave(wav_path.replace(".wav", ".png"), img)


if __name__ == "__main__":
    main()
