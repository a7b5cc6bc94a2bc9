"""Kaldi-compatible typed binary/text object I/O.

Parity with reference src/base/io-funcs.h and src/matrix kaldi-matrix I/O:
token framing (``<Token>`` ... ``</Token>``), size-marked basic types, the
``\\0B`` binary header, and Matrix/Vector/int-vector serialization ("FM ",
"FV ", "DM ", "DV ").  These formats let the TPU stack read and write
artifacts interchangeably with Kaldi tools (feats.ark, ali.ark, final.mdl),
which is the fastest correctness oracle for cross-validation (SURVEY.md §1).

All multi-byte values are little-endian, as on every platform Kaldi supports.
"""

from __future__ import annotations

import struct
from typing import BinaryIO, List

import numpy as np

from old_kaldi_git_tpu.utils.log import KaldiError

BINARY_HEADER = b"\x00B"


# ---------------------------------------------------------------------------
# low-level primitives
# ---------------------------------------------------------------------------

def init_kaldi_output_stream(f: BinaryIO, binary: bool = True) -> None:
    if binary:
        f.write(BINARY_HEADER)


def init_kaldi_input_stream(f: BinaryIO) -> bool:
    """Peek the two-byte binary header; returns True if stream is binary."""
    if f.seekable():
        pos = f.tell()
        two = f.read(2)
        if two == BINARY_HEADER:
            return True
        f.seek(pos)
        return False
    # non-seekable (pipe): use the buffered peek interface
    two = f.peek(2)[:2]  # type: ignore[attr-defined]
    if two == BINARY_HEADER:
        f.read(2)
        return True
    return False


def write_token(f: BinaryIO, token: str) -> None:
    if not token or any(c.isspace() for c in token):
        raise KaldiError(f"invalid token {token!r}")
    f.write(token.encode("utf-8") + b" ")


def read_token(f: BinaryIO) -> str:
    """Read a whitespace-terminated token, skipping leading whitespace."""
    chunks = []
    while True:
        c = f.read(1)
        if not c:
            if chunks:
                break
            raise EOFError("read_token: EOF")
        if c.isspace():
            if chunks:
                break
            continue
        chunks.append(c)
    return b"".join(chunks).decode("utf-8")


def peek_token(f: BinaryIO) -> str:
    pos = f.tell()
    try:
        tok = read_token(f)
    finally:
        f.seek(pos)
    return tok


def expect_token(f: BinaryIO, token: str) -> None:
    got = read_token(f)
    if got != token:
        raise KaldiError(f"expected token {token!r}, got {got!r}")


def write_int32(f: BinaryIO, value: int) -> None:
    f.write(b"\x04" + struct.pack("<i", value))


def read_int32(f: BinaryIO) -> int:
    marker = f.read(1)
    if marker != b"\x04":
        raise KaldiError(f"expected int32 size marker, got {marker!r}")
    return struct.unpack("<i", f.read(4))[0]


def write_float(f: BinaryIO, value: float) -> None:
    f.write(b"\x04" + struct.pack("<f", value))


def read_float(f: BinaryIO) -> float:
    marker = f.read(1)
    if marker == b"\x04":
        return struct.unpack("<f", f.read(4))[0]
    if marker == b"\x08":
        return struct.unpack("<d", f.read(8))[0]
    raise KaldiError(f"expected float size marker, got {marker!r}")


def write_double(f: BinaryIO, value: float) -> None:
    f.write(b"\x08" + struct.pack("<d", value))


def write_bool(f: BinaryIO, value: bool) -> None:
    f.write(b"T" if value else b"F")


def read_bool(f: BinaryIO) -> bool:
    c = f.read(1)
    if c == b"T":
        return True
    if c == b"F":
        return False
    raise KaldiError(f"expected bool T/F, got {c!r}")


def write_int_vector(f: BinaryIO, values) -> None:
    """vector<int32>: size marker, count, then size-marked elements.

    Reference WriteIntegerVector writes each element with its own size marker.
    """
    values = np.asarray(values, dtype=np.int32)
    write_int32(f, int(values.size))
    if values.size:
        # interleave \x04 markers with the 4-byte elements
        raw = values.astype("<i4").tobytes()
        out = bytearray()
        for i in range(0, len(raw), 4):
            out += b"\x04" + raw[i : i + 4]
        f.write(bytes(out))


def write_integer_vector(f: BinaryIO, values) -> None:
    """Reference WriteIntegerVector (io-funcs-inl.h), used INSIDE model
    objects (e.g. HmmTopology): one element-size byte, a RAW int32 count
    (no size marker), then raw elements.  Distinct from write_int_vector,
    which is the BasicVectorHolder table-value format (size-marked count +
    size-marked elements)."""
    values = np.asarray(values, dtype=np.int32)
    f.write(b"\x04" + struct.pack("<i", int(values.size)))
    if values.size:
        f.write(values.astype("<i4").tobytes())


def read_integer_vector(f: BinaryIO) -> np.ndarray:
    marker = f.read(1)
    if marker != b"\x04":
        raise KaldiError(f"expected elem-size marker 4, got {marker!r}")
    n = struct.unpack("<i", f.read(4))[0]
    if n < 0:
        raise KaldiError(f"bad integer-vector size {n}")
    raw = f.read(4 * n)
    if len(raw) != 4 * n:
        raise KaldiError("truncated integer-vector")
    return np.frombuffer(raw, dtype="<i4").astype(np.int32)


def read_int_vector(f: BinaryIO) -> np.ndarray:
    n = read_int32(f)
    if n < 0:
        raise KaldiError(f"bad int-vector size {n}")
    raw = f.read(5 * n)
    if len(raw) != 5 * n:
        raise KaldiError("truncated int-vector")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(n, 5)
    if n and not (arr[:, 0] == 4).all():
        raise KaldiError("bad element size marker in int-vector")
    return arr[:, 1:].copy().view("<i4").reshape(n)


# ---------------------------------------------------------------------------
# Matrix / Vector (reference src/matrix/kaldi-matrix.cc Write/Read)
# ---------------------------------------------------------------------------

_MAT_TOKENS = {"FM": np.float32, "DM": np.float64}
_VEC_TOKENS = {"FV": np.float32, "DV": np.float64}


def write_matrix(f: BinaryIO, mat: np.ndarray, dtype=np.float32) -> None:
    mat = np.ascontiguousarray(np.asarray(mat), dtype=dtype)
    if mat.ndim != 2:
        raise KaldiError(f"write_matrix needs 2-D, got shape {mat.shape}")
    write_token(f, "FM" if dtype == np.float32 else "DM")
    write_int32(f, mat.shape[0])
    write_int32(f, mat.shape[1])
    f.write(mat.astype("<f4" if dtype == np.float32 else "<f8").tobytes())


def read_matrix(f: BinaryIO) -> np.ndarray:
    tok = read_token(f)
    if tok == "CM":
        return _read_compressed_matrix(f)
    if tok == "CM2":
        return _read_compressed_matrix_global(f, 65535.0, "<u2")
    if tok == "CM3":
        return _read_compressed_matrix_global(f, 255.0, "u1")
    if tok not in _MAT_TOKENS:
        raise KaldiError(f"unknown matrix token {tok!r}")
    dtype = _MAT_TOKENS[tok]
    rows = read_int32(f)
    cols = read_int32(f)
    itemsize = np.dtype(dtype).itemsize
    raw = f.read(rows * cols * itemsize)
    if len(raw) != rows * cols * itemsize:
        raise KaldiError("truncated matrix data")
    fmt = "<f4" if dtype == np.float32 else "<f8"
    return np.frombuffer(raw, dtype=fmt).reshape(rows, cols).astype(dtype)


def write_vector(f: BinaryIO, vec: np.ndarray, dtype=np.float32) -> None:
    vec = np.ascontiguousarray(np.asarray(vec), dtype=dtype).reshape(-1)
    write_token(f, "FV" if dtype == np.float32 else "DV")
    write_int32(f, vec.shape[0])
    f.write(vec.astype("<f4" if dtype == np.float32 else "<f8").tobytes())


def read_vector(f: BinaryIO) -> np.ndarray:
    tok = read_token(f)
    if tok not in _VEC_TOKENS:
        raise KaldiError(f"unknown vector token {tok!r}")
    dtype = _VEC_TOKENS[tok]
    n = read_int32(f)
    itemsize = np.dtype(dtype).itemsize
    raw = f.read(n * itemsize)
    if len(raw) != n * itemsize:
        raise KaldiError("truncated vector data")
    fmt = "<f4" if dtype == np.float32 else "<f8"
    return np.frombuffer(raw, dtype=fmt).astype(dtype)


def write_compressed_matrix(f: BinaryIO, mat: np.ndarray,
                            format: int = 1) -> None:
    """Write Kaldi CompressedMatrix — reference
    src/matrix/compressed-matrix.cc CompressedMatrix::CopyFromMat + Write:

      format 1 ("CM"):  per-column percentile headers + 8-bit codes (the
                        speech-feature default; needs num_rows >= 8)
      format 2 ("CM2"): kTwoByteAuto — one uint16 code per element against
                        the global [min, min+range]
      format 3 ("CM3"): kOneByteAuto — one uint8 code per element

    Round-trips through read_matrix with quantization error ≤ range/255
    per band (1/3) or range/65535 (2)."""
    mat = np.asarray(mat, np.float64)
    if mat.ndim != 2:
        raise KaldiError(f"write_compressed_matrix needs 2-D, got {mat.shape}")
    num_rows, num_cols = mat.shape
    min_value = float(mat.min()) if mat.size else 0.0
    rng = float(mat.max() - min_value) if mat.size else 1.0
    if rng <= 0:
        rng = 1.0
    if format in (2, 3):
        levels = 65535.0 if format == 2 else 255.0
        dt = "<u2" if format == 2 else "u1"
        write_token(f, "CM2" if format == 2 else "CM3")
        f.write(struct.pack("<ff", np.float32(min_value), np.float32(rng)))
        f.write(struct.pack("<ii", num_rows, num_cols))
        codes = np.clip(
            np.round((mat - min_value) / rng * levels), 0, levels
        ).astype(dt)
        f.write(codes.tobytes())
        return
    if format != 1:
        raise KaldiError(f"unknown CompressedMatrix format {format}")

    def float_to_uint16(v):
        return np.clip(
            np.round((v - min_value) / rng * 65535.0), 0, 65535
        ).astype("<u2")

    def uint16_to_float(q):
        return min_value + rng * (q.astype(np.float64) / 65535.0)

    write_token(f, "CM")
    f.write(struct.pack("<ff", np.float32(min_value), np.float32(rng)))
    f.write(struct.pack("<ii", num_rows, num_cols))
    cols = mat.T  # [C, R]
    # per-column percentile headers (quantized, then used for coding)
    order = np.sort(cols, axis=1)
    idx = lambda frac: order[:, min(num_rows - 1, int(frac * (num_rows - 1)))]
    q0 = float_to_uint16(idx(0.0))
    q25 = float_to_uint16(idx(0.25))
    q75 = float_to_uint16(idx(0.75))
    q100 = float_to_uint16(idx(1.0))
    # keep headers strictly ordered so the decode bands are non-degenerate
    q25 = np.maximum(q25, q0 + 1)
    q75 = np.maximum(q75, q25 + 1)
    q100 = np.maximum(q100, q75 + 1)
    headers = np.stack([q0, q25, q75, q100], axis=1).astype("<u2")
    f.write(headers.tobytes())
    p0 = uint16_to_float(q0)[:, None]
    p25 = uint16_to_float(q25)[:, None]
    p75 = uint16_to_float(q75)[:, None]
    p100 = uint16_to_float(q100)[:, None]
    lo = np.clip(np.round((cols - p0) / np.maximum(p25 - p0, 1e-20) * 64.0),
                 0, 64)
    mid = np.clip(
        np.round(64.0 + (cols - p25) / np.maximum(p75 - p25, 1e-20) * 128.0),
        65, 192,
    )
    hi = np.clip(
        np.round(192.0 + (cols - p75) / np.maximum(p100 - p75, 1e-20) * 63.0),
        193, 255,
    )
    codes = np.where(cols <= p25, lo, np.where(cols <= p75, mid, hi))
    f.write(codes.astype(np.uint8).tobytes())


def _read_compressed_matrix_global(f: BinaryIO, levels: float,
                                   dt: str) -> np.ndarray:
    """Formats 2/3: global linear quantization, row-major codes."""
    min_value, rng = struct.unpack("<ff", f.read(8))
    num_rows, num_cols = struct.unpack("<ii", f.read(8))
    itemsize = np.dtype(dt).itemsize
    raw = f.read(num_rows * num_cols * itemsize)
    if len(raw) != num_rows * num_cols * itemsize:
        raise KaldiError("truncated CompressedMatrix data")
    codes = np.frombuffer(raw, dtype=dt).reshape(num_rows, num_cols)
    return (min_value + rng * codes.astype(np.float64) / levels).astype(
        np.float32)


def _read_compressed_matrix(f: BinaryIO) -> np.ndarray:
    """Read Kaldi CompressedMatrix (format 1: per-column 16-bit quantization
    with 8-bit codes against per-column percentile headers).

    Reference src/matrix/compressed-matrix.cc.
    """
    # GlobalHeader: min_value, range (float32), num_rows, num_cols (int32, raw)
    min_value, rng = struct.unpack("<ff", f.read(8))
    num_rows, num_cols = struct.unpack("<ii", f.read(8))
    # per-column header: 4 uint16 quantiles (p0, p25, p75, p100)
    headers = np.frombuffer(f.read(8 * num_cols), dtype="<u2").reshape(num_cols, 4)
    data = np.frombuffer(f.read(num_rows * num_cols), dtype=np.uint8).reshape(
        num_cols, num_rows
    )

    def uint16_to_float(q):
        return min_value + rng * (q.astype(np.float64) / 65535.0)

    p0 = uint16_to_float(headers[:, 0])
    p25 = uint16_to_float(headers[:, 1])
    p75 = uint16_to_float(headers[:, 2])
    p100 = uint16_to_float(headers[:, 3])
    c = data.astype(np.float64)
    out = np.empty((num_cols, num_rows), dtype=np.float64)
    lo = c <= 64
    mid = (c > 64) & (c <= 192)
    hi = c > 192
    for j in range(num_cols):
        cj = c[j]
        out[j] = np.where(
            lo[j],
            p0[j] + (p25[j] - p0[j]) * cj / 64.0,
            np.where(
                mid[j],
                p25[j] + (p75[j] - p25[j]) * (cj - 64.0) / 128.0,
                p75[j] + (p100[j] - p75[j]) * (cj - 192.0) / 63.0,
            ),
        )
    return out.T.astype(np.float32)


# ---------------------------------------------------------------------------
# text-mode helpers (for ark,t:)
# ---------------------------------------------------------------------------

def format_matrix_text(mat: np.ndarray) -> str:
    rows = [" ".join(f"{v:.7g}" for v in row) for row in np.asarray(mat)]
    return " [\n  " + " \n  ".join(rows) + " ]\n"


def parse_matrix_text(text: str) -> np.ndarray:
    text = text.strip()
    if not (text.startswith("[") and text.endswith("]")):
        raise KaldiError("text matrix must be bracketed")
    body = text[1:-1].strip()
    if not body:
        return np.zeros((0, 0), dtype=np.float32)
    rows: List[List[float]] = [
        [float(x) for x in line.split()] for line in body.splitlines() if line.strip()
    ]
    return np.asarray(rows, dtype=np.float32)
