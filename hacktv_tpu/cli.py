"""Command-line interface mirroring the reference hacktv binary.

Option set and semantics follow src/hacktv.c:455-535 (long-option table)
and the validation/dispatch logic at src/hacktv.c:1107-1608.  Output
goes to the file sink (`file:path`, a bare path, or `-` for stdout);
hardware sinks (hackrf/soapysdr/fl2k) need the native bridge and give a
clear error when unavailable.

Extensions over the reference (it streams until SIGINT): `--frames N`
and `--seconds S` bound the capture length for scripted use.
"""

from __future__ import annotations

import argparse
import json
import signal
import sys
from dataclasses import replace

import numpy as np

from .config.standards import (ColourMode, MacMode, Modulation, OutputType,
                               REGISTRY, get_mode, list_modes)


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hacktv_tpu",
        description="TPU-native analogue TV signal generator "
                    "(hacktv-compatible)")
    a = p.add_argument
    a("input", nargs="*", default=["test"],
      help="input: 'test' (test card), 'raw:<file>' (RGB32+PCM), "
           "'ffmpeg:<path>' (needs ffmpeg binary)")
    a("-o", "--output", default="-",
      help="output: file:<path>, -, or a bare path (default: stdout)")
    a("-m", "--mode", default="i", help="TV mode id (see --list-modes)")
    a("--list-modes", action="store_true")
    a("--json", action="store_true")
    a("-s", "--samplerate", type=float, default=16e6)
    a("--pixelrate", type=float, default=0)
    a("-l", "--level", type=float, default=None)
    a("-D", "--deviation", type=float, default=None)
    a("-G", "--gamma", type=float, default=None)
    # repo extra: the reference only carries this as a (stock-disabled)
    # mode-table field, src/video.c:221 + :4573-4581
    a("--fm-energy-dispersal", type=float, default=None)
    a("-i", "--interlace", action="store_true")
    a("--fit", choices=["stretch", "fill", "fit", "none"], default=None)
    a("--min-aspect", default=None)
    a("--max-aspect", default=None)
    a("--letterbox", action="store_true")
    a("--pillarbox", action="store_true")
    a("-r", "--repeat", action="store_true")
    a("--shuffle", action="store_true")
    a("-v", "--verbose", action="store_true")
    a("--profile", default=None, metavar="DIR",
      help="capture a JAX profiler trace of the encode loop into DIR "
           "(view with TensorBoard / xprof)")
    a("--teletext", default=None, metavar="PATH")
    a("--wss", default=None, metavar="MODE")
    a("--videocrypt", default=None, metavar="MODE")
    a("--videocrypt2", default=None, metavar="MODE")
    a("--videocrypts", default=None, metavar="MODE")
    a("--syster", default=None, metavar="MODE")
    a("--key-table-1", action="store_true")
    a("--key-table-2", action="store_true")
    a("--d11", default=None, metavar="MODE")
    a("--systercnr", default=None, metavar="MODE")
    a("--systeraudio", action="store_true")
    a("--acp", action="store_true")
    a("--vits", action="store_true")
    a("--vitc", action="store_true")
    a("--cc608", action="store_true")
    a("--filter", action="store_true", dest="vfilter")
    a("--nodate", action="store_true")
    a("--nocolour", "--nocolor", action="store_true", dest="nocolour")
    a("--s-video", action="store_true", dest="s_video")
    a("--volume", type=float, default=None)
    a("--noaudio", action="store_true")
    a("--nonicam", action="store_true")
    a("--a2stereo", action="store_true")
    a("--single-cut", action="store_true")
    a("--double-cut", action="store_true")
    a("--eurocrypt", default=None, metavar="MODE")
    a("--ec-mat-rating", type=int, default=0)
    a("--ec-ppv", default=None, nargs="?", const="0,0")
    a("--scramble-audio", action="store_true")
    a("--chid", type=lambda x: int(x, 0), default=None)
    a("--mac-audio-stereo", action="store_true")
    a("--mac-audio-mono", action="store_true")
    a("--mac-audio-high-quality", action="store_true")
    a("--mac-audio-medium-quality", action="store_true")
    a("--mac-audio-companded", action="store_true")
    a("--mac-audio-linear", action="store_true")
    a("--mac-audio-l1-protection", action="store_true")
    a("--mac-audio-l2-protection", action="store_true")
    a("--sis", default=None, metavar="MODE")
    a("--swap-iq", action="store_true")
    a("--offset", type=float, default=0)
    a("--passthru", default=None, metavar="FILE")
    a("--invert-video", action="store_true")
    a("--raw-bb-file", default=None, metavar="FILE")
    a("--raw-bb-blanking", type=int, default=0)
    a("--raw-bb-white", type=int, default=0x300)
    a("--secam-field-id", action="store_true")
    a("--secam-field-id-lines", type=int, default=None)
    a("--secam-exact", action="store_true",
      help="bit-exact host SECAM chroma path (parity oracle; the "
           "default is the TPU-native chroma program, ~1 LSB on rare "
           "round-boundary samples)")
    a("-t", "--type", default="int16",
      choices=["uint8", "int8", "uint16", "int16", "int32", "float"])
    a("-f", "--frequency", type=float, default=0,
      help="RF frequency in Hz (hardware sinks)")
    a("-g", "--gain", type=int, default=0, help="TX gain (hardware sinks)")
    a("-A", "--amp", action="store_true", help="enable TX amp (hackrf)")
    a("--antenna", default=None, help="antenna name (soapysdr)")
    a("--ffmt", default=None, help="ffmpeg input format hint")
    a("--fopts", default=None, help="ffmpeg input format options")
    a("--fl2k-audio", default="none",
      choices=["none", "stereo", "spdif"])
    a("--showecm", action="store_true",
      help="print Eurocrypt ECM/EMM details to stderr")
    a("--frames-per-block", type=int, default=0,
      help="frames synthesised per device call (0 = auto: batched for "
           "the static test card, 1 for dynamic inputs)")
    a("--devices", type=int, default=0, metavar="N",
      help="shard each block's line axis over the first N jax devices "
           "(0 = single device); output is bit-identical to "
           "single-device")
    a("--frames", type=int, default=0,
      help="stop after N frames (0 = until interrupted)")
    a("--hosts", type=int, default=0, metavar="N",
      help="multi-host streaming: split the --frames stream into N "
           "contiguous block ranges, one per process (SURVEY 2.10); "
           "each process writes <out>.partI and host 0 concatenates "
           "the ordered parts when all are complete")
    a("--host", type=int, default=0, metavar="I",
      help="this process's 0-based index for --hosts (defaults to "
           "$HACKTV_HOST_ID or 0)")
    a("--seconds", type=float, default=0,
      help="stop after S seconds of signal")
    a("--threads", action="store_true", help="accepted for compatibility")
    a("--version", action="store_true")
    return p


def _print_modes(as_json: bool) -> None:
    if as_json:
        out = {"modes": [{"id": k, "description": d}
                         for k, d in list_modes()]}
        print(json.dumps(out, indent=2))
    else:
        for k, d in list_modes():
            print(f"  {k:<14} = {d}")


def _apply_overrides(conf, args):
    kw = {}
    if args.level is not None:
        kw["level"] = args.level
    if args.deviation is not None:
        kw["fm_deviation"] = args.deviation
    if args.fm_energy_dispersal is not None:
        kw["fm_energy_dispersal"] = args.fm_energy_dispersal
    if args.gamma is not None:
        kw["gamma"] = args.gamma
    if args.interlace:
        kw["interlace"] = 1
    if args.volume is not None:
        kw["volume"] = args.volume
    if args.nocolour:
        kw["colour_mode"] = ColourMode.MONOCHROME
    if args.s_video:
        kw["s_video"] = True
    if args.noaudio:
        kw.update(fm_mono_level=0.0, fm_left_level=0.0, fm_right_level=0.0,
                  am_audio_level=0.0, nicam_level=0.0, dance_level=0.0)
    if args.nonicam:
        kw["nicam_level"] = 0.0
    if args.invert_video:
        kw["invert_video"] = True
    if args.secam_field_id:
        kw["secam_field_id"] = True
    if args.secam_field_id_lines is not None:
        kw["secam_field_id_lines"] = args.secam_field_id_lines
    if args.chid is not None:
        kw["chid"] = args.chid
    if args.mac_audio_mono:
        kw["mac_audio_stereo"] = False
    if args.mac_audio_stereo:
        kw["mac_audio_stereo"] = True
    if args.mac_audio_medium_quality:
        kw["mac_audio_quality"] = False
    if args.mac_audio_high_quality:
        kw["mac_audio_quality"] = True
    if args.mac_audio_linear:
        kw["mac_audio_companded"] = False
    if args.mac_audio_companded:
        kw["mac_audio_companded"] = True
    if args.mac_audio_l2_protection:
        kw["mac_audio_protection"] = True
    if args.mac_audio_l1_protection:
        kw["mac_audio_protection"] = False
    return replace(conf, **kw) if kw else conf


def _open_sink(args, complex_out: bool):
    target = args.output
    for hw in ("hackrf", "soapysdr", "fl2k"):
        if target == hw or target.startswith(hw + ":"):
            return _open_hw_sink(args, hw, complex_out)
    if target.startswith("file:"):
        target = target[5:]
    # prefer the native threaded sink (conversion + IO off the main
    # thread, overlapping the next block's device compute)
    from . import runtime
    if runtime.available():
        return runtime.NativeFileSink(target, args.type, complex_out)
    from .rf.file import FileSink
    return FileSink(target, args.type, complex_out)


def _open_hw_sink(args, hw: str, complex_out: bool):
    from .rf import hardware
    target = args.output
    serial = target.split(":", 1)[1] if ":" in target else None
    try:
        return hardware.open_sink(
            hw, serial, sample_rate=int(args.samplerate),
            frequency=int(args.frequency), gain=int(args.gain),
            amp=args.amp, antenna=args.antenna,
            complex_out=complex_out,
            # HackDAC/FL2K baseband mode when the output is real
            # (src/hacktv.c:1452, :1480)
            baseband=not complex_out,
            fl2k_audio=args.fl2k_audio)
    except hardware.HardwareUnavailable as e:
        raise SystemExit(str(e))


def _make_source(spec: str, active_width: int, active_lines: int,
                 frame_rate, ffmt=None, fopts=None):
    from .av.testcard import TestCardSource
    if spec == "test":
        return TestCardSource(active_width, active_lines)
    if spec.startswith("raw:"):
        from .av.rawfile import RawFileSource
        return RawFileSource(spec[4:], active_width, active_lines)
    from .av.ffmpeg import open_video_source
    path = spec.split(":", 1)[1] if spec.startswith("ffmpeg:") else spec
    return open_video_source(path, active_width, active_lines,
                             frame_rate=frame_rate, ffmt=ffmt,
                             fopts=fopts)


def _build_source(args, conf, active_width):
    """Input list -> one AV source (fit/letterbox geometry applied;
    multiple inputs sequenced with --repeat/--shuffle,
    src/hacktv.c:1502-1598)."""
    from .av.frame_ops import FitConfig, FitSource
    from .av.sequence import SequenceSource
    from .rational import Rational

    aw, al = active_width, conf.active_lines
    need_fit = (args.fit is not None or args.letterbox or args.pillarbox
                or args.min_aspect or args.max_aspect
                or any(s != "test" for s in args.input))
    ratios = (Rational(4, 3),)
    if args.letterbox or args.pillarbox:
        ratios = (Rational(16, 9),) if args.letterbox else (Rational(4, 3),)
    elif conf.mac_mode is not None:
        ratios = (Rational(4, 3), Rational(16, 9))

    def parse_ratio(s):
        if s is None:
            return None
        if ":" in s:
            a, b = s.split(":")
            return Rational(int(a), int(b))
        return Rational(*float(s).as_integer_ratio())

    cfg = FitConfig(
        width=aw, height=al,
        fit_mode=args.fit or ("fit" if args.letterbox or args.pillarbox
                              else "stretch"),
        display_aspect_ratios=ratios,
        min_display_aspect_ratio=parse_ratio(args.min_aspect),
        max_display_aspect_ratio=parse_ratio(args.max_aspect))

    def make(spec):
        def f():
            src = _make_source(spec, aw, al, conf.frame_rate,
                               ffmt=args.ffmt, fopts=args.fopts)
            if need_fit and spec != "test":
                # stream PAR (anamorphic DVD/DVB input) feeds the DAR
                # maths (src/av_ffmpeg.c:606-680)
                spar = getattr(src, "pixel_aspect_ratio", None)
                par = (Rational(spar.numerator, spar.denominator)
                       if spar is not None else None)
                return FitSource(src, cfg, par=par)
            return src
        return f

    if len(args.input) == 1 and not args.repeat and not args.shuffle:
        return make(args.input[0])()
    return SequenceSource([make(s) for s in args.input],
                          repeat=args.repeat, shuffle=args.shuffle)


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    if args.version:
        print("hacktv_tpu 1.0 (TPU-native hacktv)")
        return 0
    if args.list_modes:
        _print_modes(args.json)
        return 0

    try:
        conf = get_mode(args.mode)
    except KeyError as e:
        raise SystemExit(str(e))
    conf = _apply_overrides(conf, args)

    sample_rate = int(args.samplerate)
    pixel_rate = int(args.pixelrate)

    # pixel-rate suitability warning (src/video.c:2385-2404): an exact
    # number of samples per line needs a multiple of
    # lines * frame_rate / gcd
    import math as _math
    _pr = pixel_rate or sample_rate
    _m = conf.lines * conf.frame_rate.num
    _m //= _math.gcd(_m, conf.frame_rate.den)
    if _pr % _m:
        _r = _pr // _m
        print(f"Warning: Pixel rate {_pr} may not work well with this "
              "mode.", file=sys.stderr)
        print(f"Next valid pixel rates: {_m * _r}, {_m * (_r + 1)}",
              file=sys.stderr)

    # ---- validation (src/hacktv.c:1184-1437) -------------------------
    if (args.videocrypt or args.videocrypt2) and \
            conf.colour_mode not in (ColourMode.PAL, ColourMode.MONOCHROME):
        raise SystemExit("videocrypt requires a PAL mode")
    if args.single_cut or args.double_cut:
        if conf.mac_mode is None:
            raise SystemExit("single/double cut requires a MAC mode")
    if args.eurocrypt and conf.mac_mode is None:
        raise SystemExit("eurocrypt requires a MAC mode")
    if args.a2stereo and conf.mac_mode is not None:
        raise SystemExit("a2stereo is not available for MAC modes")

    # service/mode cross-checks (src/hacktv.c:1184-1437)
    scramblers = [s for s in (args.videocrypt, args.videocrypt2,
                              args.videocrypts, args.syster, args.d11)
                  if s]
    if args.videocrypt and args.videocrypt2 and not (
            args.videocrypt == "free" and args.videocrypt2 == "free"):
        raise SystemExit("Videocrypt I and II cannot be used together "
                         "except in free-access mode")
    if len(scramblers) > 1 and not (
            len(scramblers) == 2 and args.videocrypt
            and args.videocrypt2):
        raise SystemExit("Using multiple scrambling modes is not "
                         "supported")
    # the reference accepts any 625-line mode OR any PAL mode for these
    # (SECAM-L Syster/VC is the real French config; src/hacktv.c:1207,
    # 1218, 1236, 1306: lines != 625 && colour_mode != VID_PAL), and
    # Discret 11 likewise pairs with SECAM (src/hacktv.c:1289)
    ok625_pal = conf.lines == 625 or conf.colour_mode == ColourMode.PAL
    for flag, name in ((args.videocrypt, "Videocrypt I"),
                       (args.videocrypt2, "Videocrypt II"),
                       (args.videocrypts, "Videocrypt S"),
                       (args.syster, "Nagravision Syster")):
        if flag and not ok625_pal:
            raise SystemExit(f"{name} is only compatible with 625 line "
                             "PAL modes")
    if args.d11 and not (conf.lines == 625
                         or conf.colour_mode == ColourMode.SECAM):
        raise SystemExit("Discret 11 is only compatible with 625 line "
                         "PAL modes")
    if args.acp:
        if conf.lines not in (525, 625):
            raise SystemExit("Analogue Copy Protection is only "
                             "compatible with 525 and 625 line modes")
        if scramblers:
            raise SystemExit("Analogue Copy Protection cannot be used "
                             "with video scrambling enabled")
    if args.teletext and conf.lines != 625:
        raise SystemExit("Teletext is only available with 625 line "
                         "modes")
    if args.wss and conf.lines != 625:
        raise SystemExit("WSS is only supported for 625 line modes")
    if (args.vits or args.vitc or args.cc608) \
            and conf.lines not in (525, 625):
        raise SystemExit("VITS/VITC/CEA-608 are only supported for 625 "
                         "and 525 line raster modes")
    if args.sis and conf.lines != 625:
        raise SystemExit("SiS is only available with 625 line modes")
    if (args.ec_mat_rating or args.ec_ppv) and not args.eurocrypt:
        raise SystemExit("Maturity rating / PPV options are only used "
                         "in conjunction with Eurocrypt")

    frames_wanted = args.frames
    if args.seconds:
        fr = conf.frame_rate
        frames_wanted = max(frames_wanted,
                            int(np.ceil(args.seconds * fr.num / fr.den)))

    stop = {"flag": False}

    def _sigint(_sig, _frm):
        stop["flag"] = True
    try:
        signal.signal(signal.SIGINT, _sigint)
    except ValueError:
        pass   # not the main thread

    fpb = args.frames_per_block
    if fpb <= 0:
        if args.input == ["test"]:
            fpb = 16
        elif (conf.mac_mode is None
              and conf.colour_mode not in (ColourMode.SECAM,
                                           ColourMode.APOLLO_FSC,
                                           ColourMode.CBS_FSC)):
            # moving sources use multi-frame blocks (on-device LUT
            # conversion + absolute stacked row indices)
            fpb = 8
        else:
            fpb = 1

    devices = None
    if args.devices:
        import jax
        avail = jax.devices()
        if args.devices > len(avail):
            raise SystemExit(f"--devices {args.devices}: only "
                             f"{len(avail)} jax devices available")
        devices = avail[:args.devices]

    if conf.mac_mode is not None:
        from .video.mac import MacEncoder
        from .video.params import VideoParams
        ec = None
        if args.eurocrypt:
            from .services.eurocrypt import Eurocrypt
            ec = Eurocrypt(args.eurocrypt,
                           mat_rating=args.ec_mat_rating,
                           ppv=args.ec_ppv, nodate=args.nodate,
                           showecm=args.showecm)
        scr = 2 if args.double_cut else (1 if args.single_cut else 0)
        mac_aw, _ = MacEncoder.active_geometry(conf, sample_rate,
                                              pixel_rate)
        source = _build_source(args, conf, mac_aw)
        enc = MacEncoder(conf, sample_rate, pixel_rate, source=source,
                         frames_per_block=fpb,
                         scramble_video=scr,
                         scramble_audio=args.scramble_audio,
                         eurocrypt=ec, teletext=args.teletext,
                         devices=devices)
        complex_out = conf.output_type == OutputType.COMPLEX
        frame_samples = enc.frame_samples
    else:
        from .encoder import Encoder
        from .video.params import VideoParams
        p = VideoParams.create(conf, sample_rate, pixel_rate)
        source = _build_source(args, conf, p.active_width)
        import os as _os
        tt_clock = None
        if _os.environ.get("HACKTV_TPU_TELETEXT_TIME"):
            _t = int(_os.environ["HACKTV_TPU_TELETEXT_TIME"])
            tt_clock = lambda: _t    # deterministic test/golden runs
        enc = Encoder(conf, sample_rate, pixel_rate, source=source,
                      frames_per_block=fpb, teletext_clock=tt_clock,
                      wss=args.wss, teletext=args.teletext,
                      vfilter=args.vfilter, offset=int(args.offset),
                      swap_iq=args.swap_iq, vits=args.vits,
                      vitc=args.vitc, cc608=args.cc608, acp=args.acp,
                      videocrypt=args.videocrypt,
                      videocrypt2=args.videocrypt2,
                      videocrypts=args.videocrypts,
                      syster=args.syster, systercnr=args.systercnr,
                      syster_key_table=(1 if args.key_table_1 else
                                        2 if args.key_table_2 else 0),
                      d11=args.d11, systeraudio=args.systeraudio,
                      a2stereo=args.a2stereo, sis=args.sis,
                      passthru=args.passthru,
                      raw_bb_file=args.raw_bb_file,
                      raw_bb_blanking=args.raw_bb_blanking,
                      raw_bb_white=args.raw_bb_white,
                      secam_exact=(True if args.secam_exact else None),
                      devices=devices)
        complex_out = enc.complex_out
        frame_samples = enc.frame_samples

    # multi-host streaming (SURVEY 2.10): this process synthesizes a
    # contiguous block range and writes <out>.part<I>; host 0 stitches
    # the ordered parts into <out> once every part is complete
    host_split = None
    if args.hosts and args.hosts > 1:
        import os as _os
        hid = args.host or int(_os.environ.get("HACKTV_HOST_ID", "0"))
        if not frames_wanted:
            raise SystemExit("--hosts requires a finite stream "
                             "(--frames or --seconds)")
        if not (0 <= hid < args.hosts):
            raise SystemExit(f"--host {hid} out of range for "
                             f"--hosts {args.hosts}")
        out = args.output
        if out == "-" or any(out == h or out.startswith(h + ":")
                             for h in ("hackrf", "soapysdr", "fl2k")):
            raise SystemExit("--hosts requires a file output")
        if conf.mac_mode is not None:
            raise SystemExit("--hosts: the MAC packet multiplex is a "
                             "sequential stream; shard MAC blocks "
                             "with --devices instead")
        base_out = out[5:] if out.startswith("file:") else out
        bf_ = getattr(enc, "frames_per_block", 1)
        total_blocks = -(-frames_wanted // bf_)
        bounds = [total_blocks * j // args.hosts
                  for j in range(args.hosts + 1)]
        host_split = (args.hosts, hid, base_out, bounds)
        args.output = f"{base_out}.part{hid}"

    sink = _open_sink(args, complex_out)
    if args.verbose:
        # vid_info()-style mode report (src/video.c:4846-4860)
        fr = conf.frame_rate
        width = frame_samples // conf.lines
        if conf.mac_mode is not None:
            aw, al = type(enc).active_geometry(conf, sample_rate,
                                               pixel_rate)
        else:
            aw, al = enc.params.active_width, conf.active_lines
        print(f"Mode: {args.mode} ({REGISTRY[args.mode][1]})",
              file=sys.stderr)
        print(f"Video: {aw}x{al} {fr.num / fr.den:.2f} fps "
              f"(full frame {width}x{conf.lines})", file=sys.stderr)
        if pixel_rate and int(pixel_rate) != int(sample_rate):
            print(f"Pixel rate: {int(pixel_rate)}", file=sys.stderr)
        print(f"Sample rate: {int(sample_rate)} "
              f"({'complex' if complex_out else 'real'} int16)",
              file=sys.stderr)

    import time as _time
    t0 = _time.monotonic()
    samples_out = 0
    block = 0
    frames_done = 0
    prof = None
    if args.profile:
        import jax.profiler as _jp
        prof = _jp.trace(args.profile)
        prof.__enter__()
    try:
        # one-block pipeline: block b+1's device compute is dispatched
        # before block b's device->host copy and sink write, so the
        # transfer/IO overlap the synthesis (JAX dispatch is async)
        bf = getattr(enc, "frames_per_block", 1)
        dispatched = 0
        blk_hi = None
        if host_split is not None:
            _, hid, _, bounds = host_split
            block = bounds[hid]
            blk_hi = bounds[hid + 1]
            dispatched = frames_done = block * bf
        pending = None
        while not stop["flag"]:
            nxt = None
            if not (frames_wanted and dispatched >= frames_wanted) \
                    and not (blk_hi is not None and block >= blk_hi) \
                    and not (source is not None
                             and hasattr(source, "eof")
                             and source.eof(dispatched)):
                nxt = (block, enc.encode_block_device(block))
                block += 1
                dispatched += bf
            if pending is not None:
                b0, dev = pending
                out = enc.collect_block(b0, dev)
                if out.ndim == 1:
                    out = np.stack([out, np.zeros_like(out)], axis=-1)
                if frames_wanted and frames_done + bf > frames_wanted:
                    out = out[: (frames_wanted - frames_done)
                              * frame_samples]
                sink.write(out)
                samples_out += len(out)
                if args.verbose and b0 % 64 == 63:
                    dt = _time.monotonic() - t0
                    print(f"\r{samples_out} samples, "
                          f"{samples_out / max(dt, 1e-9) / 1e6:.1f} MS/s "
                          f"({samples_out / max(dt, 1e-9) / sample_rate:.1f}x "
                          "realtime)", end="", file=sys.stderr)
                # sink audio side-channel (HackDAC interleave, FL2K
                # stereo/spdif channels; src/hacktv.c:1586)
                if hasattr(sink, "write_audio"):
                    pcm = getattr(enc, "block_audio_pcm",
                                  lambda _b: None)(b0)
                    if pcm is not None and len(pcm):
                        sink.write_audio(pcm)
                frames_done += bf
            pending = nxt
            if pending is None:
                break
            if frames_wanted and frames_done >= frames_wanted:
                break
    except (BrokenPipeError, KeyboardInterrupt):
        pass
    finally:
        if prof is not None:
            prof.__exit__(None, None, None)
            print(f"profiler trace written to {args.profile}",
                  file=sys.stderr)
        sink.close()
        if args.verbose and hasattr(sink, "stats"):
            st = sink.stats()
            print(f"sink: {st['underruns']} underrun"
                  f"{'s' if st['underruns'] != 1 else ''}, longest "
                  f"{st['longest_shortfall_bytes']} bytes",
                  file=sys.stderr)
        if source is not None and hasattr(source, "close"):
            source.close()
        if host_split is not None:
            import os as _os
            import shutil as _sh
            import time as _tm
            n_hosts, hid, base_out, _ = host_split
            open(args.output + ".done", "w").close()
            if hid == 0:
                parts = [f"{base_out}.part{j}" for j in range(n_hosts)]
                deadline = _tm.monotonic() + 600.0
                for pth in parts:
                    while not _os.path.exists(pth + ".done"):
                        if _tm.monotonic() > deadline:
                            raise SystemExit(
                                f"--hosts: timed out waiting for {pth}")
                        _tm.sleep(0.05)
                with open(base_out, "wb") as f:
                    for pth in parts:
                        with open(pth, "rb") as g:
                            _sh.copyfileobj(g, f)
                for pth in parts:
                    _os.remove(pth)
                    _os.remove(pth + ".done")
        if args.verbose and samples_out:
            dt = _time.monotonic() - t0
            print(f"\n{samples_out} samples in {dt:.2f} s = "
                  f"{samples_out / max(dt, 1e-9) / 1e6:.1f} MS/s "
                  f"({samples_out / max(dt, 1e-9) / sample_rate:.1f}x "
                  "realtime)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
