"""Table (archive/script) I/O: the ark/scp dataflow fabric.

Parity with reference src/util/kaldi-table.h: SequentialTableReader,
RandomAccessTableReader, TableWriter over rspecifiers/wspecifiers:

    ark:foo.ark      binary archive            ark,t:-     text archive to stdout
    scp:foo.scp      script file (key → rxfilename with optional :offset)
    ark,scp:a.ark,a.scp   write archive + index
    options: t (text), p (permissive: skip bad entries), o,s,cs (accepted,
    advisory here — our random-access readers index by key anyway)

Holders supported: 'mat' (float matrix), 'vec' (float vector), 'ivec'
(int32 vector, e.g. alignments), 'text' (token sequences), 'flt' (scalar),
'wav' (RIFF wave).  Lattices get their own holder in old_kaldi_git_tpu.lat.
"""

from __future__ import annotations

import os
from typing import BinaryIO, Callable, Dict, Iterator, Optional, Tuple

import numpy as np

from old_kaldi_git_tpu.utils import io_funcs as kio_f
from old_kaldi_git_tpu.utils.kio import Input, Output
from old_kaldi_git_tpu.utils.log import KaldiError, get_logger

log = get_logger("table")


# ---------------------------------------------------------------------------
# holders
# ---------------------------------------------------------------------------

class Holder:
    name = "abstract"

    def write(self, f: BinaryIO, value, binary: bool) -> None:
        raise NotImplementedError

    def read(self, f: BinaryIO):
        """Read one object; stream is positioned just after 'key '."""
        raise NotImplementedError


class MatrixHolder(Holder):
    name = "mat"

    def write(self, f, value, binary):
        if binary:
            f.write(kio_f.BINARY_HEADER)
            kio_f.write_matrix(f, value)
        else:
            f.write(kio_f.format_matrix_text(np.asarray(value)).encode())

    def read(self, f):
        if kio_f.init_kaldi_input_stream(f):
            return kio_f.read_matrix(f)
        # text: read until closing ']'
        chunks = []
        while True:
            line = f.readline()
            if not line:
                raise KaldiError("EOF in text matrix")
            chunks.append(line.decode())
            if b"]" in line:
                break
        return kio_f.parse_matrix_text("".join(chunks))


class CompressedMatrixHolder(MatrixHolder):
    """Writes CompressedMatrix (CM) cells; reads any matrix kind (the
    binary reader dispatches on the token, so 'mat' readers also accept
    CM cells written by this holder — same as the reference)."""

    name = "cmat"

    def write(self, f, value, binary):
        if binary:
            f.write(kio_f.BINARY_HEADER)
            kio_f.write_compressed_matrix(f, value)
        else:
            f.write(kio_f.format_matrix_text(np.asarray(value)).encode())


class VectorHolder(Holder):
    name = "vec"

    def write(self, f, value, binary):
        if binary:
            f.write(kio_f.BINARY_HEADER)
            kio_f.write_vector(f, value)
        else:
            vals = " ".join(f"{v:.7g}" for v in np.asarray(value).reshape(-1))
            f.write(f" [ {vals} ]\n".encode())

    def read(self, f):
        if kio_f.init_kaldi_input_stream(f):
            return kio_f.read_vector(f)
        line = f.readline().decode().strip()
        if line.startswith("["):
            line = line[1:]
        if line.endswith("]"):
            line = line[:-1]
        return np.asarray([float(x) for x in line.split()], dtype=np.float32)


class Int32VectorHolder(Holder):
    name = "ivec"

    def write(self, f, value, binary):
        if binary:
            f.write(kio_f.BINARY_HEADER)
            kio_f.write_int_vector(f, value)
        else:
            f.write((" ".join(str(int(v)) for v in value) + "\n").encode())

    def read(self, f):
        if kio_f.init_kaldi_input_stream(f):
            return kio_f.read_int_vector(f)
        line = f.readline().decode().strip()
        return np.asarray([int(x) for x in line.split()] if line else [], dtype=np.int32)


class TextHolder(Holder):
    """Whole-line token sequence (e.g. 'text' transcripts)."""

    name = "text"

    def write(self, f, value, binary):
        if isinstance(value, (list, tuple)):
            value = " ".join(value)
        f.write((value + "\n").encode())

    def read(self, f):
        return f.readline().decode().rstrip("\n")


class FloatHolder(Holder):
    name = "flt"

    def write(self, f, value, binary):
        if binary:
            f.write(kio_f.BINARY_HEADER)
            kio_f.write_float(f, float(value))
        else:
            f.write(f"{float(value):.9g}\n".encode())

    def read(self, f):
        if kio_f.init_kaldi_input_stream(f):
            return kio_f.read_float(f)
        return float(f.readline().decode().strip())


class WaveHolder(Holder):
    name = "wav"

    def write(self, f, value, binary):
        from old_kaldi_git_tpu.utils.wav import write_wav_stream

        write_wav_stream(f, value)

    def read(self, f):
        from old_kaldi_git_tpu.utils.wav import read_wav_stream

        return read_wav_stream(f)


_HOLDERS: Dict[str, Callable[[], Holder]] = {
    "mat": MatrixHolder,
    "cmat": CompressedMatrixHolder,
    "vec": VectorHolder,
    "ivec": Int32VectorHolder,
    "text": TextHolder,
    "flt": FloatHolder,
    "wav": WaveHolder,
}


def register_holder(name: str, factory: Callable[[], Holder]) -> None:
    _HOLDERS[name] = factory


# holders registered by other modules as an import side-effect; loaded on
# demand so "post"/"lat"/"fst" tables work without a prior explicit import
_LAZY_PROVIDERS = {
    "lat": "old_kaldi_git_tpu.lat.holder",
    "clat": "old_kaldi_git_tpu.lat.holder",
    "fst": "old_kaldi_git_tpu.fst.holder",
    "post": "old_kaldi_git_tpu.hmm.posterior",
    "gpost": "old_kaldi_git_tpu.hmm.posterior",
    "egs": "old_kaldi_git_tpu.models.egs",
    "cegs": "old_kaldi_git_tpu.models.egs",
    "regx": "old_kaldi_git_tpu.transform.regtree",
}


def get_holder(name: str) -> Holder:
    if isinstance(name, Holder):
        return name
    if name not in _HOLDERS and name in _LAZY_PROVIDERS:
        import importlib

        importlib.import_module(_LAZY_PROVIDERS[name])
    if name not in _HOLDERS:
        raise KaldiError(f"unknown holder {name!r}; have {sorted(_HOLDERS)}")
    return _HOLDERS[name]()


# ---------------------------------------------------------------------------
# specifier parsing
# ---------------------------------------------------------------------------

class _Spec:
    def __init__(self, specifier: str):
        if ":" not in specifier:
            raise KaldiError(f"bad table specifier {specifier!r}")
        head, _, rest = specifier.partition(":")
        opts = head.split(",")
        self.kind = opts[0]
        if self.kind not in ("ark", "scp"):
            raise KaldiError(f"bad table specifier {specifier!r}")
        self.text = "t" in opts[1:]
        self.permissive = "p" in opts[1:]
        self.both = self.kind == "ark" and "scp" in opts[1:]
        self.target = rest

    def split_targets(self) -> Tuple[str, str]:
        ark, _, scp = self.target.partition(",")
        if not scp:
            raise KaldiError("ark,scp: needs two comma-separated filenames")
        return ark, scp


# ---------------------------------------------------------------------------
# readers / writers
# ---------------------------------------------------------------------------

def _read_key(f: BinaryIO) -> Optional[str]:
    """Read 'key ' (space-terminated); None at EOF."""
    chunks = []
    while True:
        c = f.read(1)
        if not c:
            return None if not chunks else b"".join(chunks).decode()
        if c in b" \t\n":
            if chunks:
                return b"".join(chunks).decode()
            continue
        chunks.append(c)


class SequentialTableReader:
    """Iterates (key, value) over an rspecifier in file order."""

    def __init__(self, rspecifier: str, holder: str = "mat"):
        self._spec = _Spec(rspecifier)
        self._holder = get_holder(holder)
        self._scp_entries: Optional[list] = None
        if self._spec.kind == "scp":
            with Input(self._spec.target) as f:
                lines = f.read().decode().splitlines()
            self._scp_entries = []
            for ln in lines:
                ln = ln.strip()
                if not ln:
                    continue
                key, _, rx = ln.partition(" ")
                self._scp_entries.append((key, rx.strip()))
        else:
            self._input = Input(self._spec.target)

    def __iter__(self) -> Iterator[Tuple[str, object]]:
        if self._scp_entries is not None:
            for key, rx in self._scp_entries:
                try:
                    with Input(rx) as f:
                        yield key, self._holder.read(f)
                except Exception:
                    if self._spec.permissive:
                        log.warning("skipping bad scp entry %s -> %s", key, rx)
                        continue
                    raise
        else:
            f = self._input.stream
            while True:
                key = _read_key(f)
                if key is None:
                    break
                try:
                    yield key, self._holder.read(f)
                except Exception:
                    if self._spec.permissive:
                        log.warning("skipping bad archive entry %s", key)
                        break  # cannot resync a binary stream; stop
                    raise
            self._input.close()

    def close(self) -> None:
        if self._scp_entries is None:
            self._input.close()


class RandomAccessTableReader:
    """Key-indexed access.

    scp: lazy per-key open (supports offsets — O(1) per lookup).
    ark: fully indexed on first use (offsets recorded while scanning).
    """

    def __init__(self, rspecifier: str, holder: str = "mat"):
        self._spec = _Spec(rspecifier)
        self._holder_name = holder
        self._index: Dict[str, str] = {}
        self._cache: Dict[str, object] = {}
        if self._spec.kind == "scp":
            with Input(self._spec.target) as f:
                for ln in f.read().decode().splitlines():
                    ln = ln.strip()
                    if ln:
                        key, _, rx = ln.partition(" ")
                        self._index[key] = rx.strip()
        else:
            # eager load of the archive (binary streams aren't seekable in
            # general — pipes); cache everything.
            for key, value in SequentialTableReader(rspecifier, holder):
                self._cache[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._cache or key in self._index

    def __getitem__(self, key: str):
        if key in self._cache:
            return self._cache[key]
        if key in self._index:
            holder = get_holder(self._holder_name)
            with Input(self._index[key]) as f:
                value = holder.read(f)
            return value
        raise KeyError(key)

    def get(self, key: str, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def keys(self):
        return list(self._cache.keys()) or list(self._index.keys())


class TableWriter:
    def __init__(self, wspecifier: str, holder: str = "mat"):
        self._spec = _Spec(wspecifier)
        self._holder = get_holder(holder)
        if self._spec.both:
            ark, scp = self._spec.split_targets()
            self._out = Output(ark)
            self._scp = open(scp, "w")
            self._ark_path = os.path.abspath(ark)
        else:
            self._out = Output(self._spec.target)
            self._scp = None
            self._ark_path = None

    def write(self, key: str, value) -> None:
        f = self._out.stream
        if self._scp is not None:
            offset = f.tell() + len(key) + 1
            self._scp.write(f"{key} {self._ark_path}:{offset}\n")
        f.write(key.encode() + b" ")
        self._holder.write(f, value, binary=not self._spec.text)

    def __setitem__(self, key: str, value) -> None:
        self.write(key, value)

    def close(self) -> None:
        self._out.close()
        if self._scp is not None:
            self._scp.close()

    def __enter__(self) -> "TableWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def read_table(rspecifier: str, holder: str = "mat") -> Dict[str, object]:
    """Eagerly read a whole table into an ordered dict."""
    return dict(SequentialTableReader(rspecifier, holder))
