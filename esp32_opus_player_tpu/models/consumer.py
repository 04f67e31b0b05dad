"""On-chip PCM consumers: downstream jitted stages fed straight from
the decoder's device-resident output, no host round-trip.

This is the north-star serving shape (SURVEY §2.7): StreamPool decodes
into HBM (`output="device"`), and a feature/vocoder/ASR front-end on
the SAME chip consumes the PCM blocks — the host link carries only the
compact symbol tensors in and (optionally) small feature tensors out.
The reference player's analog is the I2S DMA consumer at the end of its
pipeline (reference src/opus_decoder.cpp:154 decode loop feeding the DAC);
here the "DAC" is the next jitted stage.

Contract: the consumer's function receives each decoded frame block
verbatim as an int16 device array of shape (rows, T, CC) — raw 20 ms
blocks BEFORE pre-skip/end-trim (lo/te trim metadata rides alongside
for consumers that need sample-accurate edges; a feature front-end
never does). Rows may include bucket padding; `rows` indexes the valid
ones.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _mel_matrix(n_bins: int, n_mel: int, fs: int) -> np.ndarray:
    """Triangular mel filterbank (n_bins, n_mel), float32."""
    fmax = fs / 2
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    pts = imel(np.linspace(mel(0.0), mel(fmax), n_mel + 2))
    freqs = np.linspace(0.0, fmax, n_bins)
    W = np.zeros((n_bins, n_mel), np.float32)
    for j in range(n_mel):
        l, c, r = pts[j], pts[j + 1], pts[j + 2]
        up = (freqs - l) / max(c - l, 1e-9)
        dn = (r - freqs) / max(r - c, 1e-9)
        W[:, j] = np.clip(np.minimum(up, dn), 0.0, None)
    return W


class LogMelFrontend:
    """Vocoder/ASR-style log-mel feature stage as ONE fused jitted
    program: int16 PCM blocks -> windowed DFT (two MXU matmuls) ->
    power -> mel projection (matmul) -> log1p. Shape-polymorphic over
    (rows, T, CC); stereo mixes down. ~0.5 MFLOP per 20 ms frame —
    negligible next to the decode itself, which is the point: decode
    capacity survives an attached consumer."""

    def __init__(self, frame: int = 480, n_mel: int = 64,
                 fs: int = 48000):
        self.frame = frame
        self.n_mel = n_mel
        bins = frame // 2 + 1
        k = np.arange(frame)
        ang = 2.0 * np.pi * np.outer(k, np.arange(bins)) / frame
        win = np.hanning(frame).astype(np.float32)[:, None]
        self._Wc = jnp.asarray((np.cos(ang) * win).astype(np.float32))
        self._Ws = jnp.asarray((-np.sin(ang) * win).astype(np.float32))
        self._mel = jnp.asarray(_mel_matrix(bins, n_mel, fs))

        def fn(pcm):
            x = pcm.astype(jnp.float32) * (1.0 / 32768.0)
            x = x.mean(axis=2)                      # mono mixdown
            n, T = x.shape
            F = T // frame
            xf = x[:, :F * frame].reshape(n, F, frame)
            re = xf @ self._Wc
            im = xf @ self._Ws
            p = re * re + im * im
            return jnp.log1p(p @ self._mel)         # (n, F, n_mel)

        self._fn = jax.jit(fn)

    def __call__(self, pcm):
        return self._fn(pcm)


class OnChipConsumer:
    """Accumulates per-stream feature tensors computed ON DEVICE from
    the pool's device-resident PCM. Attach with
    ``StreamPool.attach_consumer``; features stay in HBM until
    ``fetch()`` (or feed them onward to yet another stage).

    fn: jitted callable (rows, T, CC) int16 -> (rows, ...) features.
    """

    def __init__(self, fn):
        self.fn = fn
        self._chunks: list = []    # (feats_dev, ids, rows, trims)
        self.frames = 0

    def _feed(self, pcm_dev, sidx, rows=None, trims=None):
        feats = self.fn(pcm_dev)
        self._chunks.append((feats, list(sidx), rows, trims))
        self.frames += len(sidx)

    def fetch(self) -> dict:
        """Materialize: {stream_id: (F_total, ...) features} — frame
        axes concatenated in decode order."""
        out: dict[int, list] = {}
        for feats, ids, rows, _tr in self._chunks:
            arr = np.asarray(feats)
            if rows is not None:
                arr = arr[rows]
            for r, i in enumerate(ids):
                out.setdefault(int(i), []).append(arr[r])
        self._chunks.clear()
        return {i: np.concatenate(v, axis=0) for i, v in out.items()}
