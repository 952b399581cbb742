"""Audio feature stack tests (ocr_ray.functions.audio): STFT peak-bin and
linearity properties, Slaney mel scale round-trips, filterbank geometry,
FFT resampling, dtype conversion, peak normalization and RMS silence
trimming.

Reference analogs: utils/audio/stft.py (STFT/TacotronSTFT) and
utils/audio/audio_processing.py (resample/convert/normalize/trim)."""

import numpy as np
import pytest

from ocr_ray.functions import audio as A


def _tone(freq, sr, dur=0.5, amp=1.0):
    t = np.arange(int(sr * dur)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def test_hann_window_periodic_and_symmetric():
    w = A.hann_window(8, periodic=True)
    assert w[0] == 0.0 and len(w) == 8
    # periodic window of length N = first N points of symmetric length N+1
    ws = A.hann_window(9, periodic=False)
    assert np.allclose(w, ws[:8])
    assert np.allclose(ws, ws[::-1])


def test_stft_pure_tone_peak_bin():
    sr, n_fft = 8000, 256
    for freq in (250.0, 1000.0, 2500.0):
        mag = A.stft_magnitude(_tone(freq, sr), filter_length=n_fft, hop_length=64)
        peak = np.bincount(np.argmax(mag, axis=1)).argmax()
        assert peak == round(freq * n_fft / sr)


def test_stft_linearity_and_shape():
    sr = 8000
    x = _tone(440, sr, dur=0.25)
    m1 = A.stft_magnitude(x, 256, 64)
    m3 = A.stft_magnitude(3.0 * x, 256, 64)
    assert np.allclose(m3, 3.0 * m1)
    # centered STFT frame count: 1 + len // hop
    assert m1.shape == (1 + len(x) // 64, 129)


def test_stft_zero_signal_and_win_length_guard():
    assert A.stft_magnitude(np.zeros(1000), 256, 64).max() == 0.0
    with pytest.raises(ValueError):
        A.stft_magnitude(np.zeros(1000), 256, 64, win_length=512)
    # short-audio reflect pad path must not crash
    assert A.stft_magnitude(np.ones(10), 256, 64).shape[1] == 129


def test_mel_scale_roundtrip_both_variants():
    hz = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 11025.0])
    for htk in (False, True):
        back = A.mel_to_hz(A.hz_to_mel(hz, htk), htk)
        assert np.allclose(back, hz, atol=1e-6)
    # slaney scale is linear below the 1 kHz break
    assert np.isclose(A.hz_to_mel(500.0), 7.5)


def test_mel_filterbank_geometry():
    fb = A.mel_filterbank(8000, 256, n_mels=20)
    assert fb.shape == (20, 129)
    assert (fb >= 0).all()
    # every filter is non-empty and centers are strictly increasing
    assert (fb.sum(axis=1) > 0).all()
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all() and centers[-1] > centers[0]
    # slaney norm: peak height equals 2 / (upper - lower) bandwidth
    pts = A.mel_to_hz(np.linspace(A.hz_to_mel(0.0), A.hz_to_mel(4000.0), 22))
    assert np.isclose(fb[10].max(), 2.0 / (pts[12] - pts[10]), rtol=0.15)


def test_mel_spectrogram_shape_clip_and_tone_band():
    sr = 8000
    x = _tone(1000, sr)
    mel = A.mel_spectrogram(x, sr, n_mels=16, filter_length=256, hop_length=64)
    assert mel.shape == (1 + len(x) // 64, 16)
    assert mel.min() >= np.log(1e-5) - 1e-9
    # the hottest mel band's center frequency brackets the tone
    fb = A.mel_filterbank(sr, 256, 16)
    band = int(np.argmax(mel.mean(axis=0)))
    centers = np.fft.rfftfreq(256, 1 / sr)[fb.argmax(axis=1)]
    assert abs(centers[band] - 1000) < 400
    # shorter-than-window audio is padded, not an error
    assert A.mel_spectrogram(np.ones(50), sr, 16, 256, 64).shape[1] == 16


def test_resample_length_tone_and_identity():
    sr = 8000
    x = _tone(440, sr)
    same, r = A.resample_audio(x, sr, sr)
    assert r == sr and same is x
    down, r = A.resample_audio(x, sr, 4000)
    assert r == 4000 and len(down) == len(x) // 2
    # the tone survives at the same absolute frequency
    spec = np.abs(np.fft.rfft(down))
    assert abs(np.argmax(spec) * 4000 / len(down) - 440) < 10
    up, _ = A.resample_audio(x, sr, 16000)
    assert len(up) == 2 * len(x)
    spec = np.abs(np.fft.rfft(up))
    assert abs(np.argmax(spec) * 16000 / len(up) - 440) < 10
    # constant stays (nearly) constant
    c, _ = A.resample_audio(np.full(100, 2.0), 100, 50)
    assert np.allclose(c, 2.0, atol=1e-9)


def test_convert_audio_dtype_matrix():
    f = np.array([-1.0, -0.5, 0.0, 0.5, 1.0], dtype=np.float32)
    i = A.convert_audio_dtype(f, np.int16)
    assert i.dtype == np.int16 and i[-1] == 32767 and i[0] == -32767
    back = A.convert_audio_dtype(i, np.float32)
    assert back.dtype == np.float32 and np.allclose(back, f, atol=1e-4)
    # int -> int goes through the ratio of max values
    i8 = A.convert_audio_dtype(np.array([127], np.int8), np.int16)
    assert i8[0] == 32767
    # same dtype: passthrough
    assert A.convert_audio_dtype(f, np.float32) is f


def test_normalize_audio():
    x = np.array([0.0, 0.25, 0.5], dtype=np.float64) + 3.0  # DC offset
    out = A.normalize_audio(x)
    assert out.dtype == np.int16 and np.abs(out).max() == 32767
    outf = A.normalize_audio(x, max_val=1.0)
    assert outf.dtype == np.float32 and np.isclose(np.abs(outf).max(), 1.0)
    assert abs(float(outf.mean())) < 1e-6  # mean removed
    silent = A.normalize_audio(np.zeros(16))
    assert silent.dtype == np.int16 and np.abs(silent).max() == 0


def test_trim_silence_modes():
    sr = 1000
    pad = np.zeros(sr // 2)  # 0.5 s silence
    voice = _tone(100, sr, dur=0.4, amp=0.9)
    x = np.concatenate([pad, voice, pad, voice, pad])
    t = A.trim_silence(x, sr, mode="start_end")
    # leading and trailing pads gone, middle pad kept
    assert len(x) - 2 * len(pad) - 60 <= len(t) <= len(x) - 2 * len(pad) + 60
    assert np.abs(t[:40]).max() > 0 and np.abs(t[-40:]).max() > 0
    r = A.trim_silence(x, sr, mode="remove")
    assert len(r) <= 2 * len(voice) + 180
    s = A.trim_silence(x, sr, mode="start")
    assert len(s) - (len(x) - len(pad)) <= 60 and np.abs(s[:40]).max() > 0
    # a silent gap shorter than min_silence is kept as voice
    short_gap = np.concatenate([voice, np.zeros(40), voice])
    assert len(A.trim_silence(short_gap, sr, mode="remove")) == len(short_gap)
    # all-silence input
    assert len(A.trim_silence(np.zeros(500), sr, mode="remove")) == 0
    assert len(A.trim_silence(np.zeros(500), sr, mode="start_end")) == 500
