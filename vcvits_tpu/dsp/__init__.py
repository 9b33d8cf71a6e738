from vcvits_tpu.dsp.spectrogram import (  # noqa: F401
    stft_complex,
    stft_magnitude,
    istft,
    mel_filterbank,
    spec_to_mel,
    mel_spectrogram,
    dynamic_range_compression,
)
from vcvits_tpu.dsp.pitch import coarse_f0, pyin  # noqa: F401
