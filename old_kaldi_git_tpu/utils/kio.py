"""Extended-filename stream abstraction.

Parity with reference src/util/kaldi-io.h (Input/Output classes): rxfilenames
and wxfilenames supporting plain paths, '-' (stdin/stdout), trailing-pipe
inputs (``"gunzip -c foo.gz |"``), leading-pipe outputs (``"| gzip -c > foo.gz"``),
and byte offsets (``"foo.ark:12345"``).  ``.gz`` paths are additionally handled
natively (gzip module) since that is the dominant pipe use in recipes.
"""

from __future__ import annotations

import gzip
import io
import os
import subprocess
import sys
from typing import BinaryIO, Optional

from old_kaldi_git_tpu.utils.log import KaldiError


def _classify(name: str):
    name = name.strip()
    if name == "" or name == "-":
        return "std", name, None
    if name.endswith("|"):
        return "pipe_in", name[:-1].strip(), None
    if name.startswith("|"):
        return "pipe_out", name[1:].strip(), None
    # offset: file:12345 (but avoid drive-letter-like false positives)
    if ":" in name:
        path, _, off = name.rpartition(":")
        if off.isdigit() and path:
            return "offset", path, int(off)
    return "file", name, None


class Input:
    """Opens an rxfilename for binary reading."""

    def __init__(self, rxfilename: str):
        kind, name, offset = _classify(rxfilename)
        self._proc: Optional[subprocess.Popen] = None
        if kind == "std":
            self.stream: BinaryIO = sys.stdin.buffer
        elif kind == "pipe_in":
            self._proc = subprocess.Popen(
                name, shell=True, stdout=subprocess.PIPE
            )
            self.stream = self._proc.stdout  # type: ignore[assignment]
        elif kind in ("file", "offset"):
            if not os.path.exists(name):
                raise KaldiError(f"no such file: {name}")
            if name.endswith(".gz") and kind == "file":
                self.stream = gzip.open(name, "rb")  # type: ignore[assignment]
            else:
                self.stream = open(name, "rb")
                if offset:
                    self.stream.seek(offset)
        else:
            raise KaldiError(f"cannot open {rxfilename!r} for reading")

    def close(self) -> None:
        if self.stream is not sys.stdin.buffer:
            self.stream.close()
        if self._proc is not None:
            self._proc.wait()
            if self._proc.returncode != 0:
                raise KaldiError(f"input pipe failed with rc={self._proc.returncode}")

    def __enter__(self) -> BinaryIO:
        return self.stream

    def __exit__(self, *exc) -> None:
        self.close()


class Output:
    """Opens a wxfilename for binary writing."""

    def __init__(self, wxfilename: str):
        kind, name, _ = _classify(wxfilename)
        self._proc: Optional[subprocess.Popen] = None
        if kind == "std":
            self.stream: BinaryIO = sys.stdout.buffer
        elif kind == "pipe_out":
            self._proc = subprocess.Popen(name, shell=True, stdin=subprocess.PIPE)
            self.stream = self._proc.stdin  # type: ignore[assignment]
        elif kind == "file":
            parent = os.path.dirname(os.path.abspath(name))
            os.makedirs(parent, exist_ok=True)
            if name.endswith(".gz"):
                self.stream = gzip.open(name, "wb")  # type: ignore[assignment]
            else:
                self.stream = open(name, "wb")
        else:
            raise KaldiError(f"cannot open {wxfilename!r} for writing")

    def close(self) -> None:
        if self.stream is not sys.stdout.buffer:
            self.stream.close()
        if self._proc is not None:
            self._proc.wait()
            if self._proc.returncode != 0:
                raise KaldiError(f"output pipe failed with rc={self._proc.returncode}")

    def __enter__(self) -> BinaryIO:
        return self.stream

    def __exit__(self, *exc) -> None:
        self.close()
