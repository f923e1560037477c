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
capture secaml_16M_2frames.c16 5120000 -m l test
capture secam_16M_2frames.s16 2560000 -m secam test

ls -la "$GOLDEN"
# VBI service variants
capture pal_vits_vitc_2frames.s16 2560000 -m pal --vits --vitc test
capture pal_acp_2frames.s16 2560000 -m pal --acp test
capture ntsc_cc608_2frames.s16 1911600 -s 14318181 -m ntsc --cc608 test
# Scramblers
capture pal_vc1_4frames.s16 5120000 -m pal --videocrypt free test
capture pal_vc2_4frames.s16 5120000 -m pal --videocrypt2 free test
capture pal_vc1c_4frames.s16 5120000 -m pal --videocrypt conditional test
capture pal_syster_4frames.s16 5120000 -m pal --syster premiere-fa test
capture pal_d11_6frames.s16 7680000 -m pal --d11 premiere-fa test
capture pal_systercnr_4frames.s16 5120000 -m pal --systercnr premiere-fa test
capture pal_systerfull_4frames.s16 5120000 -m pal --syster premiere-fa --systercnr premiere-fa test
capture pal_vcs_8frames.s16 10240000 -m pal --videocrypts free test
capture pali_systeraudio_2frames.c16 5120000 -m i --syster premiere-fa --systeraudio test
capture pali_sis_4frames.c16 10240000 -m i --sis dcsis test
# A2 / Zweikanalton stereo
capture palg_16M_2frames.c16 5120000 -m g test
capture palg_a2_2frames.c16 5120000 -m g --a2stereo test
capture ntscm_a2_2frames.c16 4324320 -s 13513500 -m m --a2stereo test
