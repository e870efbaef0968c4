"""STFT / ISTFT / MDCT signal ops, TPU-first.

Reference: ``audiocodec/nn/modules.py`` — custom same-padded ISTFT (:803-886),
STFT (:759-800), MDCT/IMDCT (:889-1015).

TPU-first notes
---------------
- The inverse rFFT is a dense irDFT matmul on the MXU (N=640 basis with the
  synthesis window folded in) — static, tiny, and fusable with the ISTFT-head
  linear that precedes it.
- Overlap-add is NOT a scatter: with win = 4*hop each length-hop output block
  receives exactly 4 frame parts, so OLA is a reshape + 4 shifted pads + add,
  which XLA turns into dense vector adds.
- The window envelope is computed with the same OLA from a (possibly masked)
  frame-validity mask, supporting a "virtual edge" at frame S: running a
  padded fixed-shape T-frame program produces bit-identical output to the
  reference running an S-frame program (needed for chunk-loop parity when the
  last chunk is short — reference model.py:310-373).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ISTFTConstants(NamedTuple):
    basis_re: np.ndarray  # (n_freq, n_fft) windowed irDFT cos basis
    basis_im: np.ndarray  # (n_freq, n_fft) windowed irDFT sin basis
    window_sq: np.ndarray  # (n_fft,) squared synthesis window
    n_fft: int
    hop: int
    pad: int              # (win - hop) // 2 "same" trim


def make_istft_constants(n_fft: int, hop: int) -> ISTFTConstants:
    """Precompute the windowed inverse-rDFT basis (irfft * hann folded)."""
    assert n_fft % hop == 0, "TPU OLA path assumes hop divides n_fft"
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    # periodic hann, matching torch.hann_window(win_length) (modules.py:828)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))

    k = np.arange(n_freq, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(k, n) / n_fft  # (n_freq, n_fft)
    coef = np.full((n_freq, 1), 2.0)
    coef[0, 0] = 1.0
    if n_fft % 2 == 0:
        coef[-1, 0] = 1.0
    basis_re = (coef * np.cos(phase) / n_fft) * window[None, :]
    basis_im = (-coef * np.sin(phase) / n_fft) * window[None, :]
    return ISTFTConstants(
        basis_re=basis_re.astype(np.float32),
        basis_im=basis_im.astype(np.float32),
        window_sq=(window * window).astype(np.float32),
        n_fft=n_fft,
        hop=hop,
        pad=(n_fft - hop) // 2,
    )


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """(..., T, n_fft) windowed frames -> (..., (T + r - 1) * hop) via shifted adds.

    r = n_fft // hop.  Frame t's j-th hop-block lands in output block t + j.
    """
    *lead, t, n_fft = frames.shape
    r = n_fft // hop
    parts = frames.reshape(*lead, t, r, hop)
    out = None
    for j in range(r):
        pad_spec = [(0, 0)] * len(lead) + [(j, r - 1 - j), (0, 0)]
        shifted = jnp.pad(parts[..., j, :], pad_spec)
        out = shifted if out is None else out + shifted
    return out.reshape(*lead, (t + r - 1) * hop)


def istft_same(
    consts: ISTFTConstants,
    spec_re: jnp.ndarray,
    spec_im: jnp.ndarray,
    frame_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Same-padded ISTFT (modules.py:831-886). spec: (B, T, n_freq) f32.

    ``frame_valid``: optional traced scalar — frames >= frame_valid are treated
    as nonexistent (virtual right edge), replicating a reference run with only
    that many frames. Output: (B, T * hop); with a virtual edge only the first
    ``frame_valid * hop`` samples are meaningful.
    """
    t = spec_re.shape[1]
    frames = (
        jnp.matmul(spec_re, jnp.asarray(consts.basis_re), precision=jax.lax.Precision.HIGHEST)
        + jnp.matmul(spec_im, jnp.asarray(consts.basis_im), precision=jax.lax.Precision.HIGHEST)
    )  # (B, T, n_fft), window already folded into the basis

    if frame_valid is not None:
        fmask = (jnp.arange(t) < frame_valid).astype(frames.dtype)
        frames = frames * fmask[None, :, None]
        wsq_frames = jnp.asarray(consts.window_sq)[None, :] * fmask[:, None]
    else:
        wsq_frames = jnp.broadcast_to(jnp.asarray(consts.window_sq)[None, :], (t, consts.n_fft))

    y = _overlap_add(frames, consts.hop)
    envelope = _overlap_add(wsq_frames, consts.hop)
    # NOLA guard (reference asserts > 1e-11, modules.py:883); beyond a virtual
    # edge the envelope is 0 — output there is meaningless and gets cropped.
    envelope = jnp.where(envelope > 1e-11, envelope, 1.0)
    y = y / envelope

    pad = consts.pad
    return y[:, pad : y.shape[1] - pad]


# ---------------------------------------------------------------------------
# Forward STFT (reference modules.py:759-800; log-mag/phase variant) and
# MDCT/IMDCT (modules.py:889-1015) — capability-parity modules, not in the
# production path.
# ---------------------------------------------------------------------------


class STFTConstants(NamedTuple):
    basis_re: np.ndarray  # (n_fft, n_freq) windowed DFT basis
    basis_im: np.ndarray
    n_fft: int
    hop: int
    win_length: int
    center: bool


def make_stft_constants(n_fft: int, hop: int, win_length: int, center: bool = True) -> STFTConstants:
    n_freq = n_fft // 2 + 1
    n = np.arange(win_length, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    m = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freq, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(m, k) / n_fft
    return STFTConstants(
        basis_re=(np.cos(phase) * window[:, None]).astype(np.float32),
        basis_im=(-np.sin(phase) * window[:, None]).astype(np.float32),
        n_fft=n_fft,
        hop=hop,
        win_length=win_length,
        center=center,
    )


def stft_log_mag_phase(consts: STFTConstants, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch.stft + log-magnitude/phase, matching reference STFT.forward.

    x: (B, S). Returns (log_mag, phase), each (B, T, n_freq).
    """
    if not consts.center:
        p = consts.win_length - consts.hop
        x = jnp.pad(x, ((0, 0), (p // 2, p // 2)), mode="reflect")
        n_frames = (x.shape[1] - consts.n_fft) // consts.hop + 1
        pad_mode_frames = x
    else:
        pad = consts.n_fft // 2
        pad_mode_frames = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = (pad_mode_frames.shape[1] - consts.n_fft) // consts.hop + 1

    from simwhisper_codec_tpu.ops.mel import frame_signal

    if consts.center:
        frames = frame_signal(x, consts.n_fft, consts.hop, n_frames)
    else:
        # manual framing of the already-padded signal
        g = int(np.gcd(consts.n_fft, consts.hop))
        per_frame = consts.n_fft // g
        step = consts.hop // g
        total = pad_mode_frames.shape[1] // g
        chunks = pad_mode_frames[:, : total * g].reshape(x.shape[0], total, g)
        parts = [
            jax.lax.slice_in_dim(chunks, kk, kk + step * (n_frames - 1) + 1, step, axis=1)
            for kk in range(per_frame)
        ]
        frames = jnp.concatenate(parts, axis=-1)

    re = jnp.matmul(frames, jnp.asarray(consts.basis_re), precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(consts.basis_im), precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im)
    log_mag = jnp.log(jnp.abs(mag) + 1e-5)
    phase = jnp.arctan2(im, re)
    return log_mag, phase


class MDCTConstants(NamedTuple):
    window: np.ndarray        # (frame_len,) cosine window
    pre_twiddle: np.ndarray   # complex128 (frame_len,)
    post_twiddle: np.ndarray  # complex128 (N,)
    ipre_twiddle: np.ndarray  # complex128 (2N,)
    ipost_twiddle: np.ndarray # complex128 (2N,)
    frame_len: int
    padding: str


def make_mdct_constants(frame_len: int, padding: str = "same") -> MDCTConstants:
    import scipy.signal

    n_half = frame_len // 2
    n0 = (n_half + 1) / 2
    window = np.array(scipy.signal.windows.cosine(frame_len), dtype=np.float64)
    pre = np.exp(-1j * np.pi * np.arange(frame_len) / frame_len)
    post = np.exp(-1j * np.pi * n0 * (np.arange(n_half) + 0.5) / n_half)
    ipre = np.exp(1j * np.pi * n0 * np.arange(2 * n_half) / n_half)
    ipost = np.exp(1j * np.pi * (np.arange(2 * n_half) + n0) / (2 * n_half))
    return MDCTConstants(
        window=window.astype(np.float32),
        pre_twiddle=pre,
        post_twiddle=post,
        ipre_twiddle=ipre,
        ipost_twiddle=ipost,
        frame_len=frame_len,
        padding=padding,
    )


def mdct(consts: MDCTConstants, audio: jnp.ndarray) -> jnp.ndarray:
    """MDCT (modules.py:916-947). audio: (B, S) -> (B, L, N)."""
    fl = consts.frame_len
    if consts.padding == "center":
        audio = jnp.pad(audio, ((0, 0), (fl // 2, fl // 2)))
    elif consts.padding == "same":
        audio = jnp.pad(audio, ((0, 0), (fl // 4, fl // 4)))
    else:
        raise ValueError("Padding must be 'center' or 'same'.")
    n = fl // 2
    n_frames = (audio.shape[1] - fl) // n + 1
    idx = np.arange(n_frames)[:, None] * n + np.arange(fl)[None, :]
    x = audio[:, idx]  # (B, L, fl)
    x = x * jnp.asarray(consts.window)
    xc = x.astype(jnp.complex64) * jnp.asarray(consts.pre_twiddle.astype(np.complex64))
    X = jnp.fft.fft(xc, axis=-1)[..., :n]
    res = X * jnp.asarray(consts.post_twiddle.astype(np.complex64)) * np.sqrt(1 / n)
    return jnp.real(res) * np.sqrt(2)


def imdct(consts: MDCTConstants, X: jnp.ndarray) -> jnp.ndarray:
    """IMDCT (modules.py:975-1015). X: (B, L, N) -> (B, S)."""
    b, l, n = X.shape
    Y = jnp.zeros((b, l, 2 * n), dtype=jnp.complex64)
    Y = Y.at[..., :n].set(X.astype(jnp.complex64))
    Y = Y.at[..., n:].set(-1 * jnp.conj(jnp.flip(X.astype(jnp.complex64), axis=-1)))
    y = jnp.fft.ifft(Y * jnp.asarray(consts.ipre_twiddle.astype(np.complex64)), axis=-1)
    y = jnp.real(y * jnp.asarray(consts.ipost_twiddle.astype(np.complex64))) * np.sqrt(n) * np.sqrt(2)
    result = y * jnp.asarray(consts.window)
    audio = _overlap_add(result, n)  # hop = N = frame_len // 2
    pad = consts.frame_len // 2 if consts.padding == "center" else consts.frame_len // 4
    return audio[:, pad : audio.shape[1] - pad]
