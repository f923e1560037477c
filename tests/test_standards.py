from hacktv_tpu.config import REGISTRY, get_mode
from hacktv_tpu.config.standards import (ColourMode, Modulation, OutputType,
                                         RasterType)
from hacktv_tpu.rational import Rational


def test_all_reference_modes_present():
    # The 50 mode ids of the reference's vid_configs[] table
    # (src/video.c:1956-2008).
    expected = {
        "i", "b", "g", "pal-d", "pal-k", "pal-fm", "pal", "pal-m", "pal-n",
        "525pal", "l", "d", "k", "secam-i", "secam-b", "secam-g", "secam-fm",
        "secam", "m", "ntsc-i", "ntsc-fm", "ntsc-bs", "ntsc", "pal60-i",
        "pal60", "d2mac-am", "d2mac-fm", "d2mac", "dmac-am", "dmac-fm",
        "dmac", "e", "819", "a", "ntsc-a", "405-i", "405", "ntsc-405",
        "240-am", "240", "30-am", "30", "nbtv-am", "nbtv", "apollo-fsc-fm",
        "apollo-fsc", "apollo-fm", "apollo", "m-cbs405", "cbs405",
    }
    assert set(REGISTRY) == expected


def test_pal_i_values():
    c = get_mode("i")
    assert c.output_type == OutputType.COMPLEX
    assert c.modulation == Modulation.VSB
    assert c.vsb_upper_bw == 5.5e6 and c.vsb_lower_bw == 1.25e6
    assert c.lines == 625 and c.active_lines == 576
    assert c.colour_carrier == Rational(17734475, 4)
    assert float(c.colour_carrier) == 4433618.75
    assert c.fm_mono_carrier == 5999600
    assert c.nicam_carrier == 6552000
    assert abs(c.video_level - 0.71) < 1e-12


def test_ntsc_m_values():
    c = get_mode("m")
    assert c.frame_rate == Rational(30000, 1001)
    assert c.lines == 525
    assert c.colour_carrier == Rational(39375000, 11)
    assert c.colour_mode == ColourMode.NTSC
    assert c.white_level == 0.125


def test_mac_values():
    c = get_mode("d2mac")
    assert c.type == RasterType.MAC
    assert c.chid == 0xE8B5
    assert len(c.frame_aspects) == 2


def test_aliases_share_config():
    assert get_mode("b") is get_mode("g")
    assert get_mode("d") is get_mode("k")
