"""Audio feature stack, from scratch on numpy (no scipy/librosa in this
container).

Re-expresses the reference's audio utilities — the STFT/mel pipeline
(reference utils/audio/stft.py:184-281 ``STFT`` and :282-315
``TacotronSTFT``), resampling / dtype conversion / peak normalization
(utils/audio/audio_processing.py:28-60) and RMS silence trimming
(audio_processing.py:99-198) — as vectorized numpy kernels suitable for
actor-pool ``map_batches`` stages.  All algorithms are public: the framed
rFFT with reflect padding and a centered Hann window is the standard
librosa/torch STFT contract; the Slaney mel scale and area-normalized
triangular filterbank follow the published Auditory-Toolbox/librosa
formula; FFT resampling is the classical spectrum truncation/zero-pad
method (scipy.signal.resample's documented algorithm).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# windows / framing / STFT
# ---------------------------------------------------------------------------


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Hann window; ``periodic=True`` matches the reference's fftbins
    window (stft.py:223, ``get_window(..., fftbins=periodic)``)."""
    n = win_length if periodic else win_length - 1
    if n <= 0:
        return np.ones(max(win_length, 0), dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / n)


def _pad_center(window: np.ndarray, size: int) -> np.ndarray:
    """Zero-center-pad a window to ``size`` (stft.py:224 pad_center)."""
    lpad = (size - len(window)) // 2
    out = np.zeros(size, dtype=np.float64)
    out[lpad : lpad + len(window)] = window
    return out


def frame_signal(audio: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """[n] -> [n_frames, frame_length] via a zero-copy strided view."""
    audio = np.ascontiguousarray(audio)
    n_frames = 1 + (len(audio) - frame_length) // hop_length if len(audio) >= frame_length else 0
    return np.lib.stride_tricks.as_strided(
        audio,
        shape=(n_frames, frame_length),
        strides=(audio.strides[0] * hop_length, audio.strides[0]),
        writeable=False,
    )


def stft_magnitude(
    audio: np.ndarray,
    filter_length: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    window: str | None = "hann",
    center: bool = True,
) -> np.ndarray:
    """Magnitude STFT -> [n_frames, filter_length // 2 + 1] float64.

    Matches the reference STFT contract (stft.py:238-271): reflect-pad by
    filter_length//2 on both sides, slide a centered window of
    ``win_length`` zero-padded to ``filter_length``, magnitude of the
    one-sided DFT.  The conv1d-against-Fourier-basis trick there is just
    a framed rFFT; numpy's rfft gives the identical numbers directly."""
    audio = np.asarray(audio, dtype=np.float64).ravel()
    if win_length is None:
        win_length = filter_length
    if win_length > filter_length:
        raise ValueError("win_length must be <= filter_length")
    if center:
        pad = filter_length // 2
        if len(audio) < pad + 1:  # reflect needs len > pad
            audio = np.pad(audio, (0, pad + 1 - len(audio)))
        audio = np.pad(audio, (pad, pad), mode="reflect")
    frames = frame_signal(audio, filter_length, hop_length)
    if window is not None:
        if window != "hann":
            raise NotImplementedError("only the hann window is implemented")
        frames = frames * _pad_center(hann_window(win_length), filter_length)
    return np.abs(np.fft.rfft(frames, n=filter_length, axis=1))


# ---------------------------------------------------------------------------
# mel scale / filterbank / mel spectrogram
# ---------------------------------------------------------------------------

_MEL_BREAK_HZ = 1000.0
_MEL_BREAK = 15.0  # 1000 Hz / (200/3)
_MEL_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(hz, htk: bool = False):
    """Slaney mel scale by default (librosa.filters.mel's default):
    linear below 1 kHz (200/3 Hz per mel), log-spaced above."""
    hz = np.asarray(hz, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + hz / 700.0)
    mel = hz / (200.0 / 3.0)
    above = hz >= _MEL_BREAK_HZ
    mel = np.where(
        above,
        _MEL_BREAK + np.log(np.maximum(hz, _MEL_BREAK_HZ) / _MEL_BREAK_HZ) / _MEL_LOGSTEP,
        mel,
    )
    return mel


def mel_to_hz(mel, htk: bool = False):
    mel = np.asarray(mel, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    hz = mel * (200.0 / 3.0)
    above = mel >= _MEL_BREAK
    return np.where(above, _MEL_BREAK_HZ * np.exp(_MEL_LOGSTEP * (mel - _MEL_BREAK)), hz)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft // 2 + 1] — the public
    Slaney/librosa construction the reference loads via librosa
    (stft.py:60-67): n_mels+2 points equally spaced in mel, triangles
    between consecutive points, optional 2/bandwidth area norm."""
    if fmax is None:
        fmax = sr / 2.0
    fft_hz = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    pts = mel_to_hz(np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk)
    lower, center, upper = pts[:-2, None], pts[1:-1, None], pts[2:, None]
    up = (fft_hz[None, :] - lower) / np.maximum(center - lower, 1e-12)
    down = (upper - fft_hz[None, :]) / np.maximum(upper - center, 1e-12)
    fb = np.maximum(0.0, np.minimum(up, down))
    if norm == "slaney":
        fb *= (2.0 / (upper - lower))
    elif norm is not None:
        raise NotImplementedError("norm must be 'slaney' or None")
    return fb


def mel_spectrogram(
    audio: np.ndarray,
    sr: int,
    n_mels: int = 80,
    filter_length: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    fmin: float = 0.0,
    fmax: float | None = None,
    clip_val: float = 1e-5,
) -> np.ndarray:
    """Log-mel spectrogram [n_frames, n_mels] — TacotronSTFT semantics
    (stft.py:303-310): magnitude STFT @ mel_basis.T, then log(max(x, clip)).
    Audio shorter than the window is right-zero-padded first
    (stft.py:105-107)."""
    audio = np.asarray(audio, dtype=np.float64).ravel()
    wl = win_length or filter_length
    if len(audio) < wl:
        audio = np.pad(audio, (0, wl - len(audio)))
    mag = stft_magnitude(audio, filter_length, hop_length, win_length)
    fb = mel_filterbank(sr, filter_length, n_mels, fmin, fmax)
    return np.log(np.maximum(mag @ fb.T, clip_val))


def mel_length(audio_length: int, filter_length: int = 1024, hop_length: int = 256) -> int:
    """Expected mel frame count for :func:`mel_spectrogram`'s centered
    STFT (reference analog stft.py:122-124 get_mel_length): audio shorter
    than the window is right-padded to it, then reflect-padding by
    filter_length//2 on both sides gives 1 + L//hop frames.  (The former
    ceil(L/hop) was one frame short whenever hop divides L — i.e. every
    power-of-two length.)"""
    return 1 + max(filter_length, audio_length) // hop_length


# ---------------------------------------------------------------------------
# resample / dtype / normalize / trim  (audio_processing.py analogs)
# ---------------------------------------------------------------------------


def resample_audio(audio: np.ndarray, rate: int, target_rate: int):
    """FFT resampling to ``round(len * target/rate)`` samples — the
    classical spectrum truncate/zero-pad method (the algorithm behind
    scipy.signal.resample, which the reference calls at
    audio_processing.py:28-31).  Returns (audio, target_rate)."""
    audio = np.asarray(audio)
    if rate == target_rate:
        return audio, rate
    n = len(audio)
    m = int(round(n * target_rate / rate))
    spec = np.fft.rfft(audio.astype(np.float64))
    out_bins = m // 2 + 1
    new = np.zeros(out_bins, dtype=np.complex128)
    k = min(len(spec), out_bins)
    new[:k] = spec[:k]
    # halve a shared Nyquist bin so energy splits correctly on truncation
    if m < n and m % 2 == 0 and k == out_bins:
        new[-1] *= 0.5 if n % 2 else 1.0
    out = np.fft.irfft(new, n=m) * (m / n)
    return out.astype(np.float64), target_rate


def convert_audio_dtype(audio: np.ndarray, dtype) -> np.ndarray:
    """Dtype conversion normalized by iinfo max on the integer side
    (audio_processing.py:35-46)."""
    audio = np.asarray(audio)
    dtype = np.dtype(dtype)
    if audio.dtype == dtype:
        return audio
    if np.issubdtype(audio.dtype, np.floating):
        if np.issubdtype(dtype, np.floating):
            return audio.astype(dtype)
        return (audio * np.iinfo(dtype).max).astype(dtype)
    if np.issubdtype(dtype, np.floating):
        return (audio / np.iinfo(audio.dtype).max).astype(dtype)
    return (audio.astype(np.float64) / np.iinfo(audio.dtype).max * np.iinfo(dtype).max).astype(dtype)


def normalize_audio(audio: np.ndarray, max_val: float = 32767, dtype=np.int16) -> np.ndarray:
    """Mean-remove + peak-scale to max_val (audio_processing.py:49-60);
    max_val <= 1 implies float32 output."""
    if max_val <= 1.0:
        dtype = np.float32
    audio = np.asarray(audio, dtype=np.float64)
    audio = audio - audio.mean()
    peak = np.abs(audio).max() if audio.size else 0.0
    if peak <= 1e-9:
        return audio.astype(dtype)
    return (audio * (max_val / peak)).astype(dtype)


def trim_silence(
    audio: np.ndarray,
    rate: int,
    mode: str = "start_end",
    threshold_db: float = -25.0,
    block_size: float = 0.01,
    min_silence: float = 0.1,
) -> np.ndarray:
    """RMS silence trimming (audio_processing.py:99-198 trim_silence_rms):
    per-block RMS in dB relative to the peak block, blocks below
    ``threshold_db`` for at least ``min_silence`` seconds are silence.

    Modes: 'start' / 'end' / 'start_end' drop leading/trailing silence;
    'remove' drops every silent run.  Fully vectorized (per-block RMS via
    one reshape + run boundaries via diff), like the reference's
    "full numpy" pitch."""
    audio = np.asarray(audio, dtype=np.float64).ravel()
    blk = max(1, int(round(block_size * rate)))
    n_blocks = len(audio) // blk
    if n_blocks == 0:
        return audio
    rms = np.sqrt(np.mean(audio[: n_blocks * blk].reshape(n_blocks, blk) ** 2, axis=1))
    peak = rms.max()
    if peak <= 1e-12:
        return audio[:0] if mode == "remove" else audio
    db = 20.0 * np.log10(np.maximum(rms / peak, 1e-12))
    silent = db < threshold_db
    # run-length: a silent run shorter than min_silence blocks is voice
    min_blk = max(1, int(round(min_silence / block_size)))
    edges = np.flatnonzero(np.diff(silent.astype(np.int8)))
    starts = np.concatenate([[0], edges + 1])
    ends = np.concatenate([edges + 1, [n_blocks]])
    keep = np.ones(len(audio), dtype=bool)
    n_runs = len(starts)
    for i in range(n_runs):  # runs, not samples: bounded by transitions
        if not silent[starts[i]] or ends[i] - starts[i] < min_blk:
            continue
        is_lead, is_tail = i == 0, i == n_runs - 1
        if (
            mode == "remove"
            or (mode in ("start", "start_end") and is_lead)
            or (mode in ("end", "start_end") and is_tail)
        ):
            lo = starts[i] * blk
            hi = len(audio) if is_tail else ends[i] * blk
            keep[lo:hi] = False
    return audio[keep]
