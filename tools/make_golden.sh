#!/bin/bash
# Build the reference hacktv (from /root/reference, patched only to drop the
# unavailable libavdevice dependency) and capture golden output files used by
# the SNR parity tests.  Everything stays outside the repo in /tmp.
set -e

REF=${REF:-/root/reference}
BUILD=/tmp/refbuild
GOLDEN=/tmp/golden

if [ ! -x "$BUILD/src/hacktv" ]; then
    mkdir -p "$BUILD"
    cp -r "$REF/src" "$BUILD/"
    cd "$BUILD/src"
    sed -i 's|#include <libavdevice/avdevice.h>|/* avdevice stubbed */|;
            s|avdevice_register_all();|/* stubbed */|' av_ffmpeg.c
    sed -i 's/ libavdevice//' Makefile
    # The reference's per-line chroma FIR reads a few samples past the
    # chrominance buffer (src/fir.c block prefill feeds `samples` more
    # inputs than remain), so unpatched output contains uninitialised
    # heap values in the last samples of every chroma line — and, for
    # FM/SECAM modes, an unreproducible phase walk.  Zero-allocate the
    # buffer with a margin so those reads return 0, making the golden
    # captures deterministic (this matches the batch encoder's
    # zero-padding semantics).
    sed -i 's/s->chrominance_buffer = malloc(sizeof(int16_t) \* 2 \* s->width);/s->chrominance_buffer = calloc(2 * (s->width + 64), sizeof(int16_t));/' video.c
    # Pin the Syster ECM table to the deterministic STATIC_ECM path
    # (plain --syster uses rand() seeded from time(), syster.c:452,527,
    # which would make the golden capture unreproducible).
    sed -i 's/vid->conf.systercnr ? STATIC_ECM : RANDOM_ECM/STATIC_ECM/' syster.c
    # Pin the libc PRNG seed (video.c seeds it from time(NULL); Eurocrypt
    # CW generation consumes rand(), so golden captures need a fixed,
    # replicable sequence — hacktv_tpu.services.eurocrypt.GlibcRand).
    sed -i 's/srand(time(NULL));/srand(1);/' video.c
    # Expose the stock-disabled FM energy-dispersal field (video.c:221 is
    # commented out; no CLI flag exists) through an env var so a golden
    # can exercise video.c:2245-2257 + :2301-2318.
    sed -i 's|s->conf = \*conf;|s->conf = *conf; { const char *_ed = getenv("FM_ED"); if(_ed) s->conf.fm_energy_dispersal = atof(_ed); }|' video.c
    # Pin the Eurocrypt "TODAY" broadcast date (src/eurocrypt.c:786:
    # _get_sub_date reads the wall clock, so providers with date "TODAY"
    # — e.g. teletv — would bake the capture date into the ECM).
    # 1200000000 = 2008-01-10 UTC, matching the pinned UDT timestamp.
    sed -i 's/time_t t = time(NULL);/time_t t = 1200000000;/' eurocrypt.c
    # --- D/D2-MAC determinism patches (golden-capture only) ---
    # 1. Pin the UDT date/time (mac.c calls time(NULL) at init and every
    #    25 frames, which would make golden captures unreproducible).
    sed -i 's/_update_udt(s->mac.udt, time(NULL));/_update_udt(s->mac.udt, (time_t) 1200000000);/' mac.c
    # Pin the teletext clock (8/30 packets + rolling header use
    # time(NULL) every second, src/teletext.c:605).
    sed -i 's/timestamp = time(NULL);/timestamp = (time_t) 1200000000;/' teletext.c
    # 2. Run the audio lineprocess synchronously for MAC modes: the
    #    reference's audio thread pushes packets into the MAC packet queue
    #    concurrently with the macraster thread draining it (video.c
    #    barrier pipeline), so packet timing is scheduler-dependent.
    #    Making the process non-threaded for MAC serialises it directly
    #    after macraster, giving a deterministic queue order.
    sed -i 's/_add_lineprocess(s, "audio", 1, 1, NULL, _vid_audio_process, NULL);/_add_lineprocess(s, "audio", 1, s->conf.type == VID_MAC ? 0 : 1, NULL, _vid_audio_process, NULL);/' video.c
    # 3. Optional per-line duobinary bit dump for byte-exact bit-domain
    #    tests (enabled by MAC_BITS_DUMP=<path>).
    # 4. Optional DANCE frame-byte dump (enabled by DANCE_BITS_DUMP=<path>)
    python3 - <<'PYEOF'
src = open('dance.c').read()
hook = '''			s->frame_bit = 0;
			{
				const char *_bd = getenv("DANCE_BITS_DUMP");
				if(_bd)
				{
					static FILE *_bf = NULL;
					if(!_bf) _bf = fopen(_bd, "wb");
					if(_bf) fwrite(s->frame, 1, DANCE_FRAME_BYTES, _bf);
				}
			}'''
src = src.replace('\t\t\ts->frame_bit = 0;', hook, 1)
open('dance.c', 'w').write(src)
PYEOF
    python3 - <<'PYEOF'
import re
src = open('mac.c').read()
hook = '''	{
		const char *_bd = getenv("MAC_BITS_DUMP");
		if(_bd)
		{
			static FILE *_bf = NULL;
			if(!_bf) _bf = fopen(_bd, "wb");
			if(_bf) fwrite(data, 1, MAC_LINE_BYTES, _bf);
		}
	}
	/* Render the duobinary into the line */'''
src = src.replace('\t/* Render the duobinary into the line */', hook, 1)
open('mac.c', 'w').write(src)
PYEOF
    make -j"$(nproc)" >/dev/null
fi

mkdir -p "$GOLDEN"
HACKTV="$BUILD/src/hacktv"

capture() { # capture <name> <bytes> <args...>
    local name=$1 bytes=$2; shift 2
    if [ ! -s "$GOLDEN/$name" ]; then
        echo "golden: $name"
        timeout 120 "$HACKTV" -o - "$@" 2>/dev/null | head -c "$bytes" > "$GOLDEN/$name"
    fi
}

capture_sha() { # capture_sha <name> <frames> <frame_bytes> <args...>
    # long-horizon captures stored as per-frame sha256 digests (the
    # scrambler state cadences span hundreds of frames; full streams
    # would be hundreds of MB)
    local name=$1 frames=$2 fbytes=$3; shift 3
    if [ ! -s "$GOLDEN/$name" ]; then
        echo "golden: $name"
        timeout 600 "$HACKTV" -o - "$@" 2>/dev/null \
          | head -c $((frames * fbytes)) \
          | python3 -c "
import sys, hashlib
fb = $fbytes
out = open('$GOLDEN/$name.tmp', 'wb')
while True:
    b = sys.stdin.buffer.read(fb)
    if len(b) < fb:
        break
    out.write(hashlib.sha256(b).digest())
out.close()
" && mv "$GOLDEN/$name.tmp" "$GOLDEN/$name"
    fi
}

# 4 frames PAL composite @16MS/s real s16 (640000 samples/frame * 2 bytes)
capture pal_16M_4frames.s16 5120000 -m pal test
# 2 frames NTSC composite @13.5MS/s real s16 (13.5e6/29.97 ~ 450450.45/frame)
capture ntsc_135M_2frames.s16 1801800 -s 13500000 -m ntsc test
# 2 frames PAL-I complex @16MS/s (no audio services by default? hacktv
# enables FM mono + NICAM for mode i automatically)
capture pali_16M_2frames.c16 5120000 -s 16000000 -m i test
# 2 frames 405-line composite
capture 405_14M_2frames.s16 2240000 -s 14000000 -m 405 test
# WSS on line 23
capture pal_wss_2frames.s16 2560000 -m pal --wss auto test
# video filter variants
capture pal_filter_2frames.s16 2560000 -m pal --filter test
capture pali_filter_2frames.c16 5120000 -m i --filter test
# FM satellite + SECAM
capture palfm_16M_2frames.c16 5120000 -m pal-fm test
# FM energy dispersal: the 1 MHz-deviation triangle video.c:221 ships
# commented out, enabled via the FM_ED build hook above
FM_ED=0.0625 capture palfm_ed_16M_2frames.c16 5120000 -m pal-fm test
capture secaml_16M_2frames.c16 5120000 -m l test
capture secaml_fid_2frames.c16 2560000 -m l --secam-field-id test
capture pal_svideo_2frames.c16 5120000 -m pal --s-video test
capture pal_invert_2frames.s16 2560000 -m pal --invert-video test
capture secam_svideo_2frames.c16 5120000 -m secam --s-video test
capture secam_16M_2frames.s16 2560000 -m secam test

ls -la "$GOLDEN"
# VBI service variants
capture pal_vits_vitc_2frames.s16 2560000 -m pal --vits --vitc test
capture pal_acp_2frames.s16 2560000 -m pal --acp test
capture ntsc_cc608_2frames.s16 1911600 -s 14318181 -m ntsc --cc608 test
# 525-line service variants (different line numbering: VITS 17/280,
# VITC 14/277+2, ACP 12-19/275-282; src/vits.c, vitc.c:53-61, acp.c:95)
capture ntsc_vits_vitc_2frames.s16 1801800 -s 13500000 -m ntsc --vits --vitc test
capture ntsc_acp_2frames.s16 1801800 -s 13500000 -m ntsc --acp test
# non-integer carrier-period rate: exercises the angle-addition carrier
# fallback for the service chroma mix (4x fsc)
capture ntsc143_vits_vitc_2frames.s16 1911600 -s 14318181 -m ntsc --vits --vitc test
# Combined services: every 625-line VBI service stacked at once, and a
# scrambler+VBI combination (src/hacktv.c:1184-1437 allows these)
capture pal_services_combo_2frames.s16 2560000 -m pal --wss auto --vits --vitc --acp --cc608 test
capture pal_syster_vits_4frames.s16 5120000 -m pal --syster premiere-fa --vits test
# Scramblers
capture pal_vc1_4frames.s16 5120000 -m pal --videocrypt free test
capture pal_vc2_4frames.s16 5120000 -m pal --videocrypt2 free test
capture pal_vc1c_4frames.s16 5120000 -m pal --videocrypt conditional test
capture pal_syster_4frames.s16 5120000 -m pal --syster premiere-fa test
capture pal_syster_pca_2frames.s16 2560000 -m pal --syster premiere-ca test
capture pal_syster_cfrfa_2frames.s16 2560000 -m pal --syster cfrfa test
capture pal_d11_cfrfa_2frames.s16 2560000 -m pal --d11 cfrfa test
capture pal_d11_6frames.s16 7680000 -m pal --d11 premiere-fa test
capture pal_systercnr_4frames.s16 5120000 -m pal --systercnr premiere-fa test
capture pal_systerfull_4frames.s16 5120000 -m pal --syster premiere-fa --systercnr premiere-fa test
capture pal_vcs_8frames.s16 10240000 -m pal --videocrypts free test
# Full state-cadence horizons (verdict r3 item 6): VCS's shuffle table
# cycles every 256 frames (videocrypts-sequence.h), Syster's CW applies
# on frames 6/31 of a 50-frame cycle (syster.c:706-718), VC2's ECM
# cadence spans 16 frames; stored as per-frame sha256 (bit-exact modes)
capture_sha pal_vcs_260f.sha 260 1280000 -m pal --videocrypts free test
capture_sha pal_syster_52f.sha 52 1280000 -m pal --syster premiere-fa test
capture_sha pal_vc1_16f.sha 16 1280000 -m pal --videocrypt free test
capture_sha pal_vc2_16f.sha 16 1280000 -m pal --videocrypt2 free test
capture pali_systeraudio_2frames.c16 5120000 -m i --syster premiere-fa --systeraudio test
capture pali_sis_4frames.c16 10240000 -m i --sis dcsis test
# DANCE / BS digital audio (ntsc-bs: FM + DANCE at 63e6/11 Hz)
capture ntscbs_16M_2frames.c16 4271400 -s 16000000 -m ntsc-bs test
if [ ! -s "$GOLDEN/dance_bits_100f.bin" ]; then
    echo "golden: dance_bits_100f.bin"
    DANCE_BITS_DUMP="$GOLDEN/dance_bits_100f.bin.tmp" timeout 120 "$HACKTV" -o - -s 16000000 -m ntsc-bs test 2>/dev/null | head -c 16000000 > /dev/null
    head -c $((100 * 256)) "$GOLDEN/dance_bits_100f.bin.tmp" > "$GOLDEN/dance_bits_100f.bin"
    rm -f "$GOLDEN/dance_bits_100f.bin.tmp"
fi
# Two-channel mux (BASELINE config #5 / README:90): channel 1 at
# -2.25 MHz captured to a file, channel 2 at +2.25 MHz sums it back in
# via --passthru.  2 frames PAL-I @20 MS/s = 800000 samples/frame.
capture mux_ch1_2f.c16 6400000 -s 20000000 --offset -2250000 -m i test
if [ ! -s "$GOLDEN/mux_2ch_2f.c16" ]; then
    echo "golden: mux_2ch_2f.c16"
    timeout 120 "$HACKTV" -o - -s 20000000 --offset 2250000 \
        --passthru "$GOLDEN/mux_ch1_2f.c16" -m i test 2>/dev/null \
        | head -c 6400000 > "$GOLDEN/mux_2ch_2f.c16"
fi
# A2 / Zweikanalton stereo
capture palg_16M_2frames.c16 5120000 -m g test
capture palg_a2_2frames.c16 5120000 -m g --a2stereo test
capture ntscm_a2_2frames.c16 4324320 -s 13513500 -m m --a2stereo test
# D/D2-MAC (TZ pinned; UDT time pinned in the build patch above).
# 4 frames @ 20.25 MS/s real s16 = 810000 samples/frame * 2 bytes.
export TZ=UTC0
capture d2mac_4frames.s16 6480000 -s 20250000 -m d2mac test
capture dmac_4frames.s16 6480000 -s 20250000 -m dmac test
capture d2mac_dcut_4frames.s16 6480000 -s 20250000 -m d2mac --double-cut test
capture d2mac_scut_4frames.s16 6480000 -s 20250000 -m d2mac --single-cut test
capture dmacfm_2frames.c16 6480000 -s 20250000 -m dmac-fm test
capture d2mac_mq_4frames.s16 6480000 -s 20250000 -m d2mac --mac-audio-medium-quality test
capture d2mac_lin_4frames.s16 6480000 -s 20250000 -m d2mac --mac-audio-linear --mac-audio-l2-protection test
capture d2mac_mono_4frames.s16 6480000 -s 20250000 -m d2mac --mac-audio-mono test
capture d2mac_compl2_4frames.s16 6480000 -s 20250000 -m d2mac --mac-audio-l2-protection test
capture d2mac_linl1_4frames.s16 6480000 -s 20250000 -m d2mac --mac-audio-linear test
# MAC moving video: 4 distinct deterministic raw BGRA frames fed via
# ffmpeg's rawvideo demuxer (sws BGRA->RGB32 is a byte identity), so
# the capture must show a different frame every MAC frame.
if [ ! -s "$GOLDEN/motion_702x576.bgra" ]; then
    python3 - <<'PYEOF'
import numpy as np
H, W = 576, 702
frames = []
for f in range(8):
    y, x = np.mgrid[0:H, 0:W]
    r = ((x * (f + 1)) % 256).astype(np.uint8)
    g = ((y + 40 * f) % 256).astype(np.uint8)
    b = np.full((H, W), 32 * f, np.uint8)
    bar = (x // 32 == (4 + f * 3))
    r[bar], g[bar], b[bar] = 255, 255, 255
    frames.append(np.stack([b, g, r, np.zeros_like(r)], axis=-1))
np.stack(frames).tofile('/tmp/golden/motion_702x576.bgra')
PYEOF
fi
capture d2mac_motion_3frames.s16 4860000 -s 20250000 -m d2mac \
    --ffmt rawvideo \
    --fopts video_size=702x576:pixel_format=bgra:framerate=25 \
    "$GOLDEN/motion_702x576.bgra"
# PAL moving video at the native active size (832 @ 16 MS/s, so the
# reference's swscale is an identity): the parity oracle for the
# multi-frame-block raster path
if [ ! -s "$GOLDEN/motion_832x576.bgra" ]; then
    python3 - <<'PYEOF'
import numpy as np
H, W = 576, 922
frames = []
for f in range(10):
    y, x = np.mgrid[0:H, 0:W]
    r = ((x * (f + 1)) % 256).astype(np.uint8)
    g = ((y + 40 * f) % 256).astype(np.uint8)
    b = np.full((H, W), 32 * f, np.uint8)
    bar = (x // 32 == (4 + f * 3))
    r[bar], g[bar], b[bar] = 255, 255, 255
    frames.append(np.stack([b, g, r, np.zeros_like(r)], axis=-1))
np.stack(frames).tofile('/tmp/golden/motion_832x576.bgra')
PYEOF
fi
capture pal_motion_5frames.s16 6400000 -m pal \
    --ffmt rawvideo \
    --fopts video_size=832x576:pixel_format=bgra:framerate=25 \
    "$GOLDEN/motion_832x576.bgra"
# MAC pixel-rate resample: synthesis at 20.25 MS/s, output at 10.125
capture d2mac_pr10125_2frames.s16 1620000 -s 10125000 --pixelrate 20250000 -m d2mac test
# 50-frame duobinary bit-stream dumps (162 bytes/line, byte-exact oracle)
if [ ! -s "$GOLDEN/d2mac_bits_50f.bin" ]; then
    echo "golden: d2mac_bits_50f.bin"
    MAC_BITS_DUMP="$GOLDEN/d2mac_bits_50f.bin.tmp" timeout 120 "$HACKTV" -o - -s 20250000 -m d2mac test 2>/dev/null | head -c 81000000 > /dev/null
    head -c $((50 * 625 * 162)) "$GOLDEN/d2mac_bits_50f.bin.tmp" > "$GOLDEN/d2mac_bits_50f.bin"
    rm -f "$GOLDEN/d2mac_bits_50f.bin.tmp"
fi
if [ ! -s "$GOLDEN/dmac_bits_50f.bin" ]; then
    echo "golden: dmac_bits_50f.bin"
    MAC_BITS_DUMP="$GOLDEN/dmac_bits_50f.bin.tmp" timeout 120 "$HACKTV" -o - -s 20250000 -m dmac test 2>/dev/null | head -c 81000000 > /dev/null
    head -c $((50 * 625 * 162)) "$GOLDEN/dmac_bits_50f.bin.tmp" > "$GOLDEN/dmac_bits_50f.bin"
    rm -f "$GOLDEN/dmac_bits_50f.bin.tmp"
fi

# --- Eurocrypt golden captures ---------------------------------------
# Bit-domain dumps long enough to cover a CW rotation (frame 257), ECM
# repeats (frames 1/65/129/193/257) and one EMM round (frame 127/383).
# srand(1) is pinned in the build patch above; fixed-date providers keep
# the packets time-independent (ctv=EC-M+EMMG, tv2=S2/EC-M+EMMU,
# cplus=3DES+EMMU, eros/tvs=S2 ECM-only).
ec_bits() { # ec_bits <name> <frames> <args...>
    local name=$1 frames=$2; shift 2
    if [ ! -s "$GOLDEN/$name" ]; then
        echo "golden: $name"
        MAC_BITS_DUMP="$GOLDEN/$name.tmp" timeout 300 "$HACKTV" -o - -s 20250000 "$@" 2>/dev/null | head -c $(( (frames + 2) * 810000 * 2 )) > /dev/null
        head -c $((frames * 625 * 162)) "$GOLDEN/$name.tmp" > "$GOLDEN/$name"
        rm -f "$GOLDEN/$name.tmp"
    fi
}

ec_bits d2mac_ec_ctv_bits_130f.bin 130 -m d2mac --eurocrypt ctv test
ec_bits d2mac_ec_tv2_bits_130f.bin 130 -m d2mac --eurocrypt tv2 test
ec_bits d2mac_ec_cplus_bits_130f.bin 130 -m d2mac --eurocrypt cplus --double-cut test
ec_bits d2mac_ec_eros_bits_130f.bin 130 -m d2mac --eurocrypt eros test
ec_bits dmac_ec_teletv_bits_130f.bin 130 -m dmac --eurocrypt teletv test
# --scramble-audio: PRBS3 packet scrambling of the audio stream, keyed
# by PRBS1 per packet (src/mac.c:605-638); free access + CA cases
ec_bits d2mac_sa_bits_20f.bin 20 -m d2mac --scramble-audio test
# ECM access-criteria variants: maturity rating + pay-per-view
ec_bits d2mac_ec_mr_bits_20f.bin 20 -m d2mac --eurocrypt ctv --ec-mat-rating 13 test
ec_bits d2mac_ec_ppv_bits_20f.bin 20 -m d2mac --eurocrypt ctv --ec-ppv 1234,5 test
ec_bits d2mac_ec_sa_bits_130f.bin 130 -m d2mac --eurocrypt ctv --scramble-audio test
# CW-keyed scrambling waveform (first 4 frames, initial CW from srand(1))
capture d2mac_ec_dcut_4frames.s16 6480000 -s 20250000 -m d2mac --eurocrypt ctv --double-cut test

REPO=${REPO:-/root/repo}
TTI="$REPO/tests/data/demo.tti"
if [ ! -s "$GOLDEN/pal_tt_2frames.s16" ] && [ -f "$TTI" ]; then
    echo "golden: pal_tt_2frames.s16"
    timeout 60 "$HACKTV" -o - -m pal --teletext "$TTI" test 2>/dev/null \
        | head -c $((2 * 640000 * 2)) > "$GOLDEN/pal_tt_2frames.s16"
fi
# BASELINE config #3: PAL-I with teletext + FM audio + NICAM stereo
if [ ! -s "$GOLDEN/i_tt_nicam_2frames.c16" ] && [ -f "$TTI" ]; then
    echo "golden: i_tt_nicam_2frames.c16"
    timeout 60 "$HACKTV" -o - -m i --teletext "$TTI" test 2>/dev/null \
        | head -c $((2 * 640000 * 4)) > "$GOLDEN/i_tt_nicam_2frames.c16"
fi
for mode in d2mac dmac; do
    if [ ! -s "$GOLDEN/${mode}_tt_bits_10f.bin" ] && [ -f "$TTI" ]; then
        echo "golden: ${mode}_tt_bits_10f.bin"
        MAC_BITS_DUMP="$GOLDEN/${mode}_tt.tmp" timeout 90 "$HACKTV" -o - \
            -s 20250000 -m $mode --teletext "$TTI" test 2>/dev/null \
            | head -c 48600000 > /dev/null
        head -c $((10 * 625 * 162)) "$GOLDEN/${mode}_tt.tmp" \
            > "$GOLDEN/${mode}_tt_bits_10f.bin"
        rm -f "$GOLDEN/${mode}_tt.tmp"
    fi
done
if [ ! -s "$GOLDEN/pal_pr1475_2frames.s16" ]; then
    echo "golden: pal_pr1475_2frames.s16"
    timeout 60 "$HACKTV" -o - -m pal -s 16000000 --pixelrate 14750000 \
        test 2>/dev/null | head -c $((2 * 640000 * 2)) \
        > "$GOLDEN/pal_pr1475_2frames.s16"
fi
if [ ! -s "$GOLDEN/pali_pr1475_2frames.c16" ]; then
    echo "golden: pali_pr1475_2frames.c16"
    timeout 60 "$HACKTV" -o - -m i -s 16000000 --pixelrate 14750000 \
        test 2>/dev/null | head -c $((2 * 640000 * 4)) \
        > "$GOLDEN/pali_pr1475_2frames.c16"
fi

# Legacy raster family captures (tests/test_legacy_modes.py)
legacy() {
    local m=$1 rate=$2 fmt=$3 fs=$4
    local ext=s16 mult=2
    [ "$fmt" = c ] && ext=c16 && mult=4
    local out="$GOLDEN/legacy_${m}_2f.$ext"
    [ -s "$out" ] && return
    echo "golden: legacy_${m}_2f.$ext"
    timeout 60 "$HACKTV" -o - -m $m -s $rate test 2>/dev/null \
        | head -c $((fs * mult * 2)) > "$out"
}
legacy apollo-fsc 14000000 r 467250
legacy cbs405 9000000 r 125145
legacy 819 20000000 r 800163
legacy e 20000000 c 800163
legacy 240 2000000 r 79920
legacy 30 100000 r 8010
legacy nbtv 100000 r 8000
legacy apollo 2000000 r 200000
legacy apollo-fm 2000000 c 200000
legacy pal-m 16000000 c 533925
legacy pal-n 16000000 c 640000
legacy pal60 16000000 c 533925
legacy ntsc-a 16000000 c 639900
legacy 405 16000000 c 639900
legacy secam-fm 20250000 c 810000
legacy d2mac-am 20250000 c 810000
legacy dmac-am 20250000 c 810000
legacy b 16000000 c 640000
legacy pal-d 16000000 c 640000
legacy pal-k 16000000 c 640000
legacy 525pal 13500000 r 450450
legacy d 16000000 c 640000
legacy k 16000000 c 640000
legacy secam-i 16000000 c 640000
legacy secam-b 16000000 c 640000
legacy secam-g 16000000 c 640000
legacy ntsc-i 13500000 c 450450
legacy ntsc-fm 13500000 c 450450
legacy pal60-i 13500000 c 450450
legacy d2mac-fm 20250000 c 810000
legacy a 14000000 c 560115
legacy 405-i 14000000 c 560115
legacy ntsc-405 14000000 r 560115
legacy 240-am 2000000 c 79920
legacy 30-am 100000 c 8010
legacy nbtv-am 100000 c 8000
legacy apollo-fsc-fm 13500000 c 450450
legacy m-cbs405 14000000 c 194400

# Raw 42-byte teletext packet input (src/teletext.c:1081-1201), with a
# partial tail exercising the feof/no-packet wrap behaviour
if [ ! -s "$GOLDEN/pal_ttraw_2frames.s16" ] && [ -f "$REPO/tests/data/raw_tt_packets.bin" ]; then
    echo "golden: pal_ttraw_2frames.s16"
    timeout 60 "$HACKTV" -o - -m pal --teletext "raw:$REPO/tests/data/raw_tt_packets.bin" test 2>/dev/null \
        | head -c $((2 * 640000 * 2)) > "$GOLDEN/pal_ttraw_2frames.s16"
fi
