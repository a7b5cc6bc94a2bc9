"""RIFF WAVE reading/writing.

Parity with reference src/feat/wave-reader.h (WaveData): 16-bit PCM mono/multi
channel RIFF parsing tolerant of pipe output (missing/overstated sizes), and
writing for synthetic-corpus generation.  Samples are float32 in the range of
int16 (Kaldi convention: NOT normalized to [-1,1]).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import BinaryIO

import numpy as np

from old_kaldi_git_tpu.utils.log import KaldiError


@dataclasses.dataclass
class WaveData:
    samp_freq: float
    data: np.ndarray  # [num_channels, num_samples] float32, int16 range

    @property
    def duration(self) -> float:
        return self.data.shape[1] / self.samp_freq


def read_wav_stream(f: BinaryIO) -> WaveData:
    riff = f.read(12)
    if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
        raise KaldiError("not a RIFF WAVE stream")
    samp_freq = None
    num_channels = None
    bits = None
    data = None
    while True:
        header = f.read(8)
        if len(header) < 8:
            break
        chunk_id, size = header[:4], struct.unpack("<I", header[4:])[0]
        if chunk_id == b"fmt ":
            fmt = f.read(size)
            (audio_fmt, num_channels, rate, _byte_rate, _align, bits) = struct.unpack(
                "<HHIIHH", fmt[:16]
            )
            if audio_fmt not in (1, 0xFFFE):  # PCM / extensible
                raise KaldiError(f"unsupported WAVE format tag {audio_fmt}")
            samp_freq = float(rate)
        elif chunk_id == b"data":
            raw = f.read(size) if size != 0xFFFFFFFF else f.read()
            data = raw
            break
        else:
            f.read(size + (size & 1))
    if samp_freq is None or data is None:
        raise KaldiError("WAVE stream missing fmt/data chunk")
    if bits != 16:
        raise KaldiError(f"only 16-bit PCM supported, got {bits}")
    samples = np.frombuffer(data, dtype="<i2")
    n = (len(samples) // num_channels) * num_channels
    samples = samples[:n].reshape(-1, num_channels).T.astype(np.float32)
    return WaveData(samp_freq=samp_freq, data=samples)


def write_wav_stream(f: BinaryIO, wave: WaveData) -> None:
    data = np.asarray(wave.data)
    if data.ndim == 1:
        data = data[None, :]
    num_channels, num_samples = data.shape
    pcm = np.clip(np.round(data.T), -32768, 32767).astype("<i2").tobytes()
    rate = int(wave.samp_freq)
    byte_rate = rate * num_channels * 2
    f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
    f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, num_channels, rate, byte_rate, num_channels * 2, 16))
    f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


def read_wav(path_or_rx: str) -> WaveData:
    from old_kaldi_git_tpu.utils.kio import Input

    with Input(path_or_rx) as f:
        return read_wav_stream(f)


def write_wav(path: str, samples: np.ndarray, samp_freq: float) -> None:
    with open(path, "wb") as f:
        write_wav_stream(f, WaveData(samp_freq=samp_freq, data=np.asarray(samples)))
