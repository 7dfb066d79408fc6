"""ctypes wrapper for the native C++ BPE tokenizer.

Compiles ``tokenizer.cpp`` on first use (g++ -O2 -shared, cached next to the
source); ``FastTokenizer`` mirrors the Python :class:`Tokenizer`'s interface
and exact semantics — the Python one stays as the always-available fallback
(``load_tokenizer`` picks automatically).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tokenizer.cpp")
_SO = os.path.join(_DIR, "_tokenizer.so")
_lock = threading.Lock()
_lib = None


class FastTokenizerUnavailable(RuntimeError):
    pass


def _load_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            # build to a per-pid temp path and rename: another process may be
            # compiling concurrently, and dlopen of a half-written .so aborts
            tmp = f"{_SO}.{os.getpid()}.tmp"
            try:
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, _SO)
            except (OSError, subprocess.CalledProcessError) as e:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise FastTokenizerUnavailable(f"cannot build fast tokenizer: {e}")
        lib = ctypes.CDLL(_SO)
        lib.l2t_create.restype = ctypes.c_void_p
        lib.l2t_create.argtypes = [ctypes.c_char_p, ctypes.c_int32]
        lib.l2t_destroy.argtypes = [ctypes.c_void_p]
        lib.l2t_max_token_len.restype = ctypes.c_int32
        lib.l2t_max_token_len.argtypes = [ctypes.c_void_p]
        lib.l2t_vocab_size.restype = ctypes.c_int32
        lib.l2t_vocab_size.argtypes = [ctypes.c_void_p]
        lib.l2t_token.restype = ctypes.c_int32
        lib.l2t_token.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint32,
            ctypes.c_char_p,
            ctypes.c_int32,
        ]
        lib.l2t_lookup.restype = ctypes.c_int32
        lib.l2t_lookup.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32]
        lib.l2t_encode.restype = ctypes.c_int32
        lib.l2t_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int32,
        ]
        _lib = lib
        return lib


class FastTokenizer:
    """Native tokenizer with the Python Tokenizer's interface and semantics."""

    def __init__(self, path: str, vocab_size: int):
        lib = _load_lib()
        self._lib = lib
        self._h = lib.l2t_create(path.encode(), vocab_size)
        if not self._h:
            raise FileNotFoundError(f"cannot load tokenizer file: {path}")
        self.max_token_len = lib.l2t_max_token_len(self._h)
        self.vocab_size = lib.l2t_vocab_size(self._h)
        # token texts for the decode path (framing rules live in Python)
        buf = ctypes.create_string_buffer(max(self.max_token_len, 1) * 2 + 8)
        self.tokens: list[bytes] = []
        for i in range(self.vocab_size):
            n = lib.l2t_token(self._h, i, buf, len(buf))
            self.tokens.append(buf.raw[:n])

    @classmethod
    def from_file(cls, path: str, vocab_size: int) -> "FastTokenizer":
        return cls(path, vocab_size)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.l2t_destroy(h)
            self._h = None

    def lookup(self, piece: bytes | str) -> int | None:
        if isinstance(piece, str):
            piece = piece.encode("utf-8")
        r = self._lib.l2t_lookup(self._h, piece, len(piece))
        return None if r < 0 else r

    def encode(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        cap = max(len(data), 1)
        out = (ctypes.c_uint32 * cap)()
        n = self._lib.l2t_encode(self._h, data, len(data), out, cap)
        if n == -1:
            raise ValueError("token not found for codepoint in input")
        if n == -3:
            raise ValueError("invalid UTF-8 in input")
        if n < 0:
            raise RuntimeError(f"fast tokenizer error {n}")
        return list(out[:n])

    # decode-side framing is identical to the Python tokenizer
    def decode_token(self, prev_token: int, token: int) -> bytes:
        from llama2_tpu.tokenizer.tokenizer import Tokenizer

        return Tokenizer.decode_token(self, prev_token, token)  # type: ignore[arg-type]

    def decode(self, ids, first_prev: int = 1) -> bytes:
        out = bytearray()
        prev = first_prev
        for t in ids:
            out += self.decode_token(prev, t)
            prev = t
        return bytes(out)


def load_tokenizer(path: str, vocab_size: int):
    """FastTokenizer when buildable, else the pure-Python Tokenizer."""
    try:
        return FastTokenizer(path, vocab_size)
    except FastTokenizerUnavailable:
        from llama2_tpu.tokenizer.tokenizer import Tokenizer

        return Tokenizer.from_file(path, vocab_size)
