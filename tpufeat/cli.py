"""Command-line front-end (reference L4, SURVEY.md §1).

The reference's ``main()`` reads a WAV, runs the CPU and GPU paths, compares
them, and prints timings. The rebuild's CLI does the same jobs as subflags:

  python -m tpufeat.cli audio.wav out.npy --preset mfcc13
  python -m tpufeat.cli a.wav b.wav out.npz --preset whisper80   # batched
  python -m tpufeat.cli audio.wav out.npy --validate             # vs goldens
  python -m tpufeat.cli audio.wav out.npy --profile /tmp/trace   # XLA trace
  python -m tpufeat.cli audio.wav out.htk --preset mfcc13        # HTK file
  python -m tpufeat.cli a.wav b.wav out.ark --preset kaldi39     # Kaldi ark+scp
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

from tpufeat import features, io
from tpufeat.config import PRESETS


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpufeat",
        description="TPU-native ASR feature extraction (WAV -> features)")
    p.add_argument("inputs", nargs="+",
                   help="input WAV file(s) followed by the output path "
                        "(.npy for one input, .npz for a batch; .htk/.mfc "
                        "writes HTK parameter files, .ark a Kaldi binary "
                        "archive + .scp index)")
    p.add_argument("--preset", default="mfcc13", choices=sorted(PRESETS),
                   help="pipeline preset (default: mfcc13)")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="override a FeatureConfig field, e.g. --set n_mels=40 "
                        "--set lifter=22 (repeatable)")
    p.add_argument("--validate", action="store_true",
                   help="also run the float64 NumPy and C++ goldens and "
                        "print max-abs-error (the reference's check)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace into DIR")
    p.add_argument("--time", action="store_true",
                   help="print wall-clock timings and RTFx")
    p.add_argument("--stream", type=int, metavar="CHUNK", default=0,
                   help="process through the streaming front-end in CHUNK-"
                        "sample chunks (config 4) instead of one-shot")
    p.add_argument("--resample", action="store_true",
                   help="resample inputs whose rate differs from the "
                        "config's sample_rate (polyphase MXU matmul, "
                        "matches scipy.resample_poly)")
    p.add_argument("--htk-compress", action="store_true",
                   help="write .htk outputs in HTKBook _C compressed "
                        "form (per-column int16 quantization, half the "
                        "file size)")
    p.add_argument("--pitch", action="store_true",
                   help="append Kaldi-style 3-dim pitch features (POV, "
                        "log-pitch, delta-log-pitch) to every frame; the "
                        "batch is truncated to the pitch tracker's frame "
                        "grid (its correlation window extends frame_length "
                        "+ max-lag samples)")
    return p


def parse_overrides(cfg, pairs):
    fields = {f.name: f.type for f in dataclasses.fields(cfg)}
    kw = {}
    for pair in pairs:
        k, _, v = pair.partition("=")
        if k not in fields:
            raise SystemExit(f"unknown config field {k!r}; valid: "
                             f"{', '.join(sorted(fields))}")
        cur = getattr(cfg, k)
        if isinstance(cur, bool):
            kw[k] = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            kw[k] = int(v)
        elif isinstance(cur, float) or cur is None:
            kw[k] = float(v)
        else:
            kw[k] = v
    return dataclasses.replace(cfg, **kw)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if len(args.inputs) < 2:
        raise SystemExit("need at least one input WAV and one output path")
    *wavs, out_path = args.inputs
    cfg = parse_overrides(PRESETS[args.preset], args.set)

    try:
        sigs, rates = zip(*(io.read_wav(w) for w in wavs))
    except FileNotFoundError as e:
        raise SystemExit(f"input not found: {e.filename}")
    sigs = list(sigs)
    for i, (w, r) in enumerate(zip(wavs, rates)):
        if r != cfg.sample_rate:
            if not args.resample:
                raise SystemExit(f"{w}: sample rate {r} != config "
                                 f"{cfg.sample_rate}; pass --resample to "
                                 f"convert on-device")
            from tpufeat.resampling import resample as _resample
            sigs[i] = np.asarray(_resample(sigs[i], r, cfg.sample_rate))
    lengths = np.array([len(s) for s in sigs], dtype=np.int32)
    batch = np.zeros((len(sigs), int(lengths.max())), dtype=np.float32)
    for b, s in enumerate(sigs):
        batch[b, : len(s)] = s

    def run():
        if args.stream > 0:
            from tpufeat import streaming
            fe = streaming.StreamingFrontend(cfg, batch_size=len(sigs))
            outs = []
            n = batch.shape[1]
            pad = (-n) % args.stream
            padded = np.pad(batch, ((0, 0), (0, pad)))
            for pos in range(0, padded.shape[1], args.stream):
                feats, mask = fe.process(padded[:, pos: pos + args.stream])
                outs.append((np.asarray(feats), np.asarray(mask)))
            feats = np.concatenate([o[0] for o in outs], axis=1)
            mask = np.concatenate([o[1] for o in outs], axis=1)
            # chunk masks are per-chunk valid flags; rebuild global validity
            # and TRIM to each utterance's true frame count — the batch was
            # zero-padded (to the longest utterance and to a chunk multiple)
            # and the streaming front-end sees that padding as real audio,
            # so frames past num_frames(length) are padding-derived.
            nf = np.array([cfg.num_frames(int(l)) for l in lengths],
                          dtype=np.int32)
            f = np.zeros((len(sigs), max(int(nf.max()), 1), feats.shape[-1]),
                         np.float32)
            m = np.zeros(f.shape[:2], bool)
            for b in range(len(sigs)):
                f[b, : nf[b]] = feats[b][mask[b]][: nf[b]]
                m[b, : nf[b]] = True
            return features.FeatureResult(f, m, nf)
        res = features.extract(batch, lengths, cfg)
        res.features.block_until_ready()
        return res

    t0 = time.perf_counter()
    res = run()
    compile_s = time.perf_counter() - t0

    if args.profile:
        import jax
        with jax.profiler.trace(args.profile):
            run()
        print(f"profile trace written to {args.profile}", file=sys.stderr)

    feats = np.asarray(res.features)
    mask = np.asarray(res.mask)
    if args.pitch:
        from tpufeat import pitch as pitchmod
        # derive the tracker config from the FEATURE config: same sample
        # rate + hop + centering, so pitch frame t and spectral frame t
        # sit on the same grid (a hardcoded default here once meant 8 kHz
        # configs got 2x pitch and centered configs a ~2-frame offset)
        pf, pvalid = pitchmod.pitch_features(
            batch, lengths=lengths, cfg=pitchmod.config_for(cfg))
        pf, pvalid = np.asarray(pf), np.asarray(pvalid)
        fp = min(pf.shape[1], feats.shape[1])    # shared hop grid; the
        feats = np.concatenate(                  # pitch window is longer,
            [feats[:, :fp], pf[:, :fp]], axis=-1)  # so truncate to it
        mask = mask[:, :fp] & pvalid[:, :fp]
    ext = os.path.splitext(out_path)[1].lower()
    if args.pitch and (ext in (".htk", ".mfc", ".fea") or args.validate):
        raise SystemExit("--pitch composes with .npy/.npz/.ark outputs "
                         "only (no HTK parmKind describes appended pitch, "
                         "and --validate's goldens cover the spectral "
                         "features alone)")
    if ext in (".htk", ".mfc", ".fea"):
        # HTK interchange (one utterance per file; batch -> suffixed files)
        from tpufeat import feats_io
        shift = cfg.hop_length / cfg.sample_rate
        # qualifiers shared by both base kinds: D/A/T for the delta
        # stages (HTKBook third-differential ceiling matches the config's
        # delta_order cap), Z for CMVN
        quals = []
        if cfg.deltas:
            quals += ["D", "A", "T"][: cfg.delta_order]
        if cfg.cmvn != "none":
            quals += ["Z"]
        if cfg.plp_order > 0:
            # PLP base kind (HTKBook kind 11); c0 is the residual
            # log-energy, so stamp _E and move it last per HTK block order
            quals = ["E"] + quals
            kind = feats_io.parm_kind(feats_io.HTK_PLP, *quals)
            reorder = lambda f: feats_io.to_htk_order(  # noqa: E731
                f, cfg.plp_order + 1)
        elif cfg.n_mfcc > 0:
            # E (c0 := log-energy) or 0 (c0 kept); HTKBook puts that term
            # LAST in each static/delta/accel block, so reorder from this
            # package's c0-first (Kaldi) layout to match the parmKind
            quals = (["E"] if cfg.use_energy else ["0"]) + quals
            kind = feats_io.parm_kind(feats_io.HTK_MFCC, *quals)
            reorder = lambda f: feats_io.to_htk_order(f, cfg.n_mfcc)  # noqa: E731
        elif cfg.n_mels == 0:
            # raw (log-)power-spectrum features: no HTKBook base kind
            # describes them, so stamp USER (kind 9) — delta/CMVN
            # qualifiers stay (they don't imply a column order for USER
            # data); energy is element 0 in this package's layout
            kind = feats_io.parm_kind(feats_io.HTK_USER, *quals)
            reorder = lambda f: f  # noqa: E731
        elif cfg.use_energy:
            # fbank + prepended energy column (dim n_mels+1): HTKBook _E
            # puts the energy term LAST in each block, so reorder from
            # this package's energy-first layout
            quals = ["E"] + quals
            kind = feats_io.parm_kind(feats_io.HTK_FBANK, *quals)
            reorder = lambda f: feats_io.to_htk_order(  # noqa: E731
                f, cfg.n_mels + 1)
        else:
            kind = feats_io.parm_kind(feats_io.HTK_FBANK, *quals)
            reorder = lambda f: f  # noqa: E731
        paths = [out_path] if len(wavs) == 1 else [
            f"{os.path.splitext(out_path)[0]}.{b}{ext}"
            for b in range(len(wavs))]
        for b, p in enumerate(paths):
            feats_io.write_htk(p, reorder(feats[b][mask[b]]),
                               frame_shift_s=shift, kind=kind,
                               compress=args.htk_compress)
    elif ext == ".ark":
        from tpufeat import feats_io
        keys = feats_io.ark_keys([os.path.basename(w) for w in wavs])
        utts = {k: feats[b][mask[b]] for b, k in enumerate(keys)}
        feats_io.write_kaldi_ark(out_path, utts,
                                 scp_path=os.path.splitext(out_path)[0]
                                 + ".scp")
    elif len(wavs) == 1:
        np.save(out_path, feats[0][mask[0]])
    else:
        np.savez(out_path, features=feats, mask=mask, lengths=lengths)
    print(f"wrote {out_path}: batch={feats.shape[0]} frames={feats.shape[1]} "
          f"dim={feats.shape[2]}", file=sys.stderr)

    if args.time:
        t1 = time.perf_counter()
        run()
        steady = time.perf_counter() - t1
        audio_s = float(lengths.sum()) / cfg.sample_rate
        print(json.dumps({
            "compile_plus_run_s": round(compile_s, 4),
            "steady_state_s": round(steady, 6),
            "audio_s": round(audio_s, 3),
            "rtfx": round(audio_s / steady, 1),
        }))

    if args.validate:
        from tpufeat.reference import cpu
        errs = {}
        for b, s in enumerate(sigs):
            gold = cpu.extract(s.astype(np.float64), cfg)
            got = feats[b][mask[b]]
            errs.setdefault("numpy_f64", 0.0)
            errs["numpy_f64"] = max(errs["numpy_f64"],
                                    float(np.abs(got - gold).max()))
            try:
                from tpufeat import cpp_golden
                native = cpp_golden.plp_native if cfg.plp_order > 0 \
                    else cpp_golden.mfcc_native
                g2 = native(s.astype(np.float64), cfg)
                errs["cpp_golden"] = max(errs.get("cpp_golden", 0.0),
                                         float(np.abs(got - g2).max()))
            except Exception:
                pass  # C++ golden covers classic configs only
        print(json.dumps({"max_abs_err": errs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
