from tpuasr.audio.fbank import (
    fbank,
    fbank_batch,
    frame_signal,
    hamming_window,
    mel_filterbank,
    num_frames,
)

__all__ = [
    "fbank",
    "fbank_batch",
    "frame_signal",
    "hamming_window",
    "mel_filterbank",
    "num_frames",
]
