"""Independent numpy oracle of the reference's transformer forward pass.

This deliberately re-implements the *reference semantics* (main.zig:285-430) in
plain numpy, reading the checkpoint file with its own parser, so the JAX engine
and this oracle share no code. Used as the ground truth for argmax-parity
tests (SURVEY.md section 4: the reference validates the model by
cross-implementation output comparison; this oracle plays the role of the
reference CPU binary, which is not runnable here — no Zig toolchain and
stories15M.bin is stripped from the snapshot).

Numerics notes: the reference builds with fast-math (main.zig:11-13) so it is
not bit-stable itself; parity means identical argmax token IDs. rmsnorm eps is
added AFTER the mean (main.zig:452-454); RoPE is interleaved-pair with
``freq = 10000^(-(i mod hs)/hs)`` (main.zig:336-351); attention is causal by
construction with ``1/sqrt(hs)`` scaling (main.zig:361-389).
"""

from __future__ import annotations

import struct

import numpy as np


class OracleModel:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            dim, hidden, n_layers, n_heads, n_kv_heads, vocab, seq_len = struct.unpack(
                "<7i", f.read(28)
            )
            shared = vocab > 0
            vocab = abs(vocab)
            data = np.fromfile(f, dtype=np.float32)
        self.dim, self.hidden_dim, self.n_layers = dim, hidden, n_layers
        self.n_heads, self.n_kv_heads = n_heads, n_kv_heads
        self.vocab_size, self.seq_len = vocab, seq_len
        self.head_size = dim // n_heads
        self.kv_dim = dim * n_kv_heads // n_heads
        self.kv_mul = n_heads // n_kv_heads
        hs = self.head_size
        kv = self.kv_dim

        pos = 0

        def take(*shape):
            nonlocal pos
            n = int(np.prod(shape))
            out = data[pos : pos + n].reshape(shape)
            pos += n
            return out

        self.token_embedding = take(vocab, dim)
        self.rms_att = take(n_layers, dim)
        self.wq = take(n_layers, dim, dim)
        self.wk = take(n_layers, kv, dim)
        self.wv = take(n_layers, kv, dim)
        self.wo = take(n_layers, dim, dim)
        self.rms_ffn = take(n_layers, dim)
        self.w1 = take(n_layers, hidden, dim)
        self.w2 = take(n_layers, dim, hidden)
        self.w3 = take(n_layers, hidden, dim)
        self.rms_final = take(dim)
        take(seq_len, hs // 2)  # freq_cis_real, skipped
        take(seq_len, hs // 2)  # freq_cis_imag, skipped
        self.wcls = self.token_embedding if shared else take(vocab, dim)

        # KV cache: (layer, seq_len, kv_dim)
        self.key_cache = np.zeros((n_layers, seq_len, kv), dtype=np.float32)
        self.value_cache = np.zeros((n_layers, seq_len, kv), dtype=np.float32)

    @staticmethod
    def _rmsnorm(x: np.ndarray, w: np.ndarray) -> np.ndarray:
        ss = float(np.mean(x.astype(np.float64) ** 2)) + 1e-5
        return (x * (1.0 / np.sqrt(ss))).astype(np.float32) * w

    def forward(self, token: int, pos: int) -> np.ndarray:
        """One (token, pos) step; mutates the KV cache; returns logits."""
        dim, hs, kv = self.dim, self.head_size, self.kv_dim
        x = self.token_embedding[token].copy()

        i = np.arange(0, dim, 2)
        head_dim = (i % hs).astype(np.float32)
        freq = 1.0 / (10000.0 ** (head_dim / hs))
        val = pos * freq
        fcr, fci = np.cos(val), np.sin(val)

        for l in range(self.n_layers):
            xb = self._rmsnorm(x, self.rms_att[l])
            q = self.wq[l] @ xb
            k = self.wk[l] @ xb
            v = self.wv[l] @ xb

            # RoPE: interleaved pairs; q over all dim, k over first kv_dim.
            q0, q1 = q[0::2].copy(), q[1::2].copy()
            q[0::2] = q0 * fcr - q1 * fci
            q[1::2] = q0 * fci + q1 * fcr
            nk = kv // 2
            k0, k1 = k[0::2].copy(), k[1::2].copy()
            k[0::2] = k0 * fcr[:nk] - k1 * fci[:nk]
            k[1::2] = k0 * fci[:nk] + k1 * fcr[:nk]

            self.key_cache[l, pos] = k
            self.value_cache[l, pos] = v

            xb_out = np.zeros(dim, dtype=np.float32)
            for h in range(self.n_heads):
                qh = q[h * hs : (h + 1) * hs]
                kvh = h // self.kv_mul
                keys = self.key_cache[l, : pos + 1, kvh * hs : (kvh + 1) * hs]
                att = (keys @ qh) / np.sqrt(hs)
                att = att - att.max()
                att = np.exp(att)
                att /= att.sum()
                vals = self.value_cache[l, : pos + 1, kvh * hs : (kvh + 1) * hs]
                xb_out[h * hs : (h + 1) * hs] = att @ vals

            x = x + self.wo[l] @ xb_out

            xb = self._rmsnorm(x, self.rms_ffn[l])
            hb = self.w1[l] @ xb
            hb2 = self.w3[l] @ xb
            hb = hb * (1.0 / (1.0 + np.exp(-hb)))  # SiLU
            x = x + self.w2[l] @ (hb * hb2)

        x = self._rmsnorm(x, self.rms_final)
        return self.wcls @ x

    def generate_argmax(self, prompt: list[int], steps: int) -> list[int]:
        """The reference generation loop (main.zig:987-1042) at temperature 0.

        Starts from BOS, teacher-forces the prompt, stops on BOS.
        """
        steps = max(1, min(steps if steps else self.seq_len, self.seq_len))
        token = 1
        out = []
        for pos in range(steps):
            logits = self.forward(token, pos)
            nxt = prompt[pos] if pos < len(prompt) else int(np.argmax(logits))
            if nxt == 1:
                break
            out.append(nxt)
            token = nxt
        return out
