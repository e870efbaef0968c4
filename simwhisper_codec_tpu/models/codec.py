"""The full codec: orchestration, jitted tokenize/detokenize, chunked streaming.

Reference: ``audiocodec/model.py`` — AudioCodec (:15-396) with
``inference_tokenize`` (:167-210), ``inference_detokenize`` (:212-242),
chunked ``encode`` (:244-308) / ``decode`` (:310-373), training ``forward``
(:112-165), ``load_from_checkpoint`` (:375-396).

TPU-first design
----------------
The reference round-trips waveforms device->CPU->device for the mel frontend
(model.py:180-187) and Python-loops over batches (model.py:293-295, 358-360).
Here each of tokenize/detokenize is ONE fixed-shape jitted program:

    wav (B, 480000) ──mel──encoder──downsample──FSQ──> codes (8, B, 375)
    codes (8, B, 375) ──FSQ⁻¹──upsample──decoder──Vocos──> wav (B, 480000)

Chunked streaming encode/decode keeps the reference's exact chunk arithmetic
(stride = 30 s - overlap, per-chunk valid-region extraction, final
``length // 1280`` trim) as a host loop around the two jitted calls.  Short
final chunks reuse the same compiled program: the chunk width is passed as a
*traced* "virtual edge" scalar that reproduces the reference's shorter-array
conv/ISTFT boundary behavior exactly (see ops/stft.py, models/vocos.py).
Batches are padded to a fixed batch size so each program compiles once.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simwhisper_codec_tpu.config import CodecConfig, load_config
from simwhisper_codec_tpu.models import sampling, transformer, vocos
from simwhisper_codec_tpu.ops import fsq, mel
from simwhisper_codec_tpu.ops.snake import make_alias_free_constants

logger = logging.getLogger(__name__)


class CodecConstants:
    """Host-precomputed constant buffers (filters, DFT bases, FSQ levels)."""

    def __init__(self, cfg: CodecConfig):
        self.mel = mel.make_constants(cfg.feature_extractor)
        self.af = make_alias_free_constants()
        self.fsq = fsq.make_constants(cfg.quantizer)
        self.vocos = vocos.make_constants(cfg.vocos)


def tokenize(
    cfg: CodecConfig,
    consts: CodecConstants,
    params: dict,
    wav: jnp.ndarray,
    sample_lengths: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
    attn_impl: str = "dense",
    fused_ffn: bool = False,
    ffn_impl=None,
) -> Dict[str, jnp.ndarray]:
    """wav (B, chunk_samples) + lengths -> codes. Mirrors inference_tokenize.

    Returns {"zq": (B, Tc, D), "codes": (G, B, Tc) int32, "codes_lengths": (B,)}.
    """
    feats = mel.log_mel(consts.mel, wav, precision=precision)  # (B, T_mel, 80)
    mel_lens = mel.mel_lengths(sample_lengths, consts.mel.hop, consts.mel.n_frames)

    dtype = jnp.dtype(cfg.compute_dtype)
    feats = feats.astype(dtype)

    enc, enc_len = transformer.encoder_forward(
        cfg.acoustic_encoder, params["encoder"], feats, mel_lens, precision=precision,
        attn_impl=attn_impl, fused_ffn=fused_ffn, ffn_impl=ffn_impl,
    )
    z, z_len = sampling.frame_stack_down(cfg.downsample, consts.af, params["downsample"], enc, enc_len)
    zq, codes = fsq.group_fsq_forward(consts.fsq, z.astype(jnp.float32), z_len)
    return {"zq": zq, "codes": codes, "codes_lengths": z_len}


def detokenize(
    cfg: CodecConfig,
    consts: CodecConstants,
    params: dict,
    codes: jnp.ndarray,
    code_lengths: jnp.ndarray,
    code_frame_valid: Optional[jnp.ndarray] = None,
    precision=jax.lax.Precision.HIGHEST,
    attn_impl: str = "dense",
    fused_vocos: bool = False,
    fused_ffn: bool = False,
    ffn_impl=None,
) -> Dict[str, jnp.ndarray]:
    """codes (G, B, Tc) -> waveform. Mirrors inference_detokenize.

    ``code_frame_valid``: traced scalar — the chunk width the reference would
    have processed (<= Tc). Drives the virtual right edge through the decoder
    deconvs / Vocos convs / ISTFT envelope.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    zq = fsq.group_fsq_decode(consts.fsq, codes, code_lengths).astype(dtype)  # (B, Tc, D)
    up, up_len = sampling.frame_stack_up(cfg.upsample, consts.af, params["upsample"], zq, code_lengths)
    dec, dec_len = transformer.decoder_forward(
        cfg.acoustic_decoder, params["decoder"], up, up_len, precision=precision,
        attn_impl=attn_impl, fused_ffn=fused_ffn, ffn_impl=ffn_impl,
    )
    frame_valid = None
    if code_frame_valid is not None:
        frame_valid = code_frame_valid * cfg.upsample.stack_factor * cfg.acoustic_decoder.stride_size
    audio, out_len = vocos.vocos_forward(
        cfg.vocos, consts.vocos, params["vocos"], dec, dec_len, frame_valid=frame_valid,
        precision=precision, fused=fused_vocos,
    )
    return {"y": audio, "output_length": out_len}


def training_forward(
    cfg: CodecConfig,
    consts: CodecConstants,
    params: dict,
    mel_features: jnp.ndarray,
    mel_lens: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
) -> Dict[str, jnp.ndarray]:
    """Training forward (model.py:112-165): mel -> ... -> reconstructed audio.

    STE gradients flow through the FSQ round; the frozen encoder is handled by
    the optimizer masking, not here.
    """
    enc, enc_len = transformer.encoder_forward(
        cfg.acoustic_encoder, params["encoder"], mel_features, mel_lens, precision=precision
    )
    z, z_len = sampling.frame_stack_down(cfg.downsample, consts.af, params["downsample"], enc, enc_len)
    zq, codes = fsq.group_fsq_forward(consts.fsq, z, z_len)
    up, up_len = sampling.frame_stack_up(cfg.upsample, consts.af, params["upsample"], zq, z_len)
    dec, dec_len = transformer.decoder_forward(
        cfg.acoustic_decoder, params["decoder"], up, up_len, precision=precision
    )
    audio, out_len = vocos.vocos_forward(
        cfg.vocos, consts.vocos, params["vocos"], dec, dec_len, precision=precision
    )
    return {"reconstructed_audio": audio, "audio_lengths": out_len, "codes": codes}


def init_params(key, cfg: CodecConfig) -> dict:
    """Random initialization of the full codec (for training / tests)."""
    keys = jax.random.split(key, 5)
    return {
        "encoder": transformer.init_encoder(keys[0], cfg.acoustic_encoder),
        "downsample": sampling.init_frame_stack_down(keys[1], cfg.downsample),
        "upsample": sampling.init_frame_stack_up(keys[2], cfg.upsample),
        "decoder": transformer.init_decoder(keys[3], cfg.acoustic_decoder),
        "vocos": vocos.init_vocos(keys[4], cfg.vocos),
    }


def fast_mode_settings(backend: str = None) -> dict:
    """THE serving/bench fast-mode configuration, in one place.

    Both ``AudioCodec(mode="fast")`` and ``bench.py`` build their jitted
    programs from this dict, so the benchmarked program IS the serving
    program: bf16 compute, default-precision (MXU bf16) matmuls, MXU-aligned
    single-block attention, fused Pallas kernels wherever Mosaic is available
    (not the CPU interpreter).
    """
    backend = backend or jax.default_backend()
    fused = backend != "cpu"
    return {
        "compute_dtype": "bfloat16",
        "precision": jax.lax.Precision.DEFAULT,
        # pflash = packed single-matmul QKV (XLA, peak MXU) + head-sliced
        # Pallas attention core with zero transposes — the round-3 A/B
        # winner: 2732x vs 2483x RT end-to-end at batch 16, codes agree with
        # f32 parity at 97.6% (vs 97.45% for chunked-bf16), compile 28 s vs
        # 344 s (docs/TPU_NOTES.md).  CPU backends keep the pure-XLA chunked
        # path (interpret-mode Pallas would crawl).
        "attn_impl": "pflash:768" if fused else "chunked:1536:bf16",
        "fused_ffn": fused,
        # SIMWHISPER_FUSED_VOCOS=dw folds the dwconv k7 + edge mask into the
        # ConvNeXt kernel (single HBM read per block; ops/fused_convnext.py
        # fused_convnext_block_dw) — the A/B knob for TPU_NOTES "MFU lever
        # accounting" candidate 1
        "fused_vocos": (os.environ.get("SIMWHISPER_FUSED_VOCOS") or True)
        if fused else False,
        # int8 serving (mode="fast-int8", ops/quant.py + fused kernel):
        # fused Pallas int8 FFN/ConvNeXt where Mosaic is available, the XLA
        # dynamic-int8 path on CPU (interpret-mode kernels would be slow)
        "int8_ffn_impl": "int8-fused" if fused else "int8",
        "int8_vocos": "int8" if fused else False,
    }


class AudioCodec:
    """User-facing codec with the reference's API shape.

    Chunked ``encode``/``decode`` replicate model.py:244-373 exactly; both wrap
    a single compiled fixed-shape program per direction.
    """

    def __init__(
        self,
        cfg: CodecConfig,
        params: dict,
        batch_size: int = 8,
        precision: str = "highest",
        mode: str = "parity",
        attn_impl: Optional[str] = None,
        data_parallel: bool = False,
        aot_dir: Optional[str] = None,
        wire: str = "float32",
    ):
        """mode: "parity" (f32, HIGHEST matmuls — bit-exact codes vs the
        reference) or "fast" (bf16 compute, default-precision matmuls — the
        serving path).  ``attn_impl``: "dense" (default) or "flash" (Pallas
        blockwise kernel; requires a backend with Mosaic support — the
        tunneled axon platform does not compile it).

        mode "fast-int8": bf16 encode + int8 decode — the decode side
        (decoder FFNs + Vocos pointwise, 72% of round-trip FLOPs) runs the
        fused Pallas int8 kernels while the tokenize program stays bf16, so
        the code indices are BIT-IDENTICAL to mode="fast" (codes are produced
        entirely by the encode path) at most of the int8 speed win.

        mode "fast-int8-full": int8 on both sides (max throughput; codes
        agree with bf16 at ~97% — the naive-dynamic-quant encoder is the
        sensitive stack, docs/TPU_NOTES.md round-3 sweep).

        wire: host<->device waveform transfer format. "float32" (default)
        ships waveforms as f32; "pcm16" ships them as int16 and converts on
        device, halving transfer bytes — the usual bottleneck on PCIe hosts
        and THE bottleneck through the tunneled dev backend.  PCM16 wire is
        bit-exact vs float wire whenever the source audio is 16-bit PCM at
        the target rate (int16/32768 is exact in f32; the output quantizer is
        the save_audio formula, which the reference pipeline applies between
        every stage anyway — helpers.py:95-103 writes 16-bit PCM and every
        eval tool reloads it)."""
        if mode in ("fast", "fast-int8", "fast-int8-full"):
            fastkw = fast_mode_settings()
            cfg = dataclasses.replace(cfg, compute_dtype=fastkw["compute_dtype"])
            precision = "default"
            # MXU-aligned single-block attention: same speed as dense, half
            # the compile time (Pallas flash needs a Mosaic-capable backend)
            self._attn_impl = attn_impl or fastkw["attn_impl"]
            if attn_impl is None and self._attn_impl.startswith("pflash"):
                from simwhisper_codec_tpu.ops.flash_attention import pflash_supported

                enc, dec = cfg.acoustic_encoder, cfg.acoustic_decoder
                if not (pflash_supported(enc.d_model, enc.encoder_attention_heads)
                        and pflash_supported(dec.d_model, dec.decoder_attention_heads)):
                    # head geometry can't 128-align (tiny configs): keep the
                    # pure-XLA chunked path instead of a trace-time error
                    self._attn_impl = "chunked:1536:bf16"
        else:
            self._attn_impl = attn_impl or "dense"
        self.mode = mode
        self.cfg = cfg
        self.consts = CodecConstants(cfg)
        self.mesh = None
        self._data_sharding = None
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
        ffn_impl = None        # tokenize-side FFN impl
        detok_ffn_impl = None  # detokenize-side FFN impl
        int8_vocos = None
        if mode in ("fast-int8", "fast-int8-full"):
            from simwhisper_codec_tpu.ops.quant import (
                quantize_stacked_convnext,
                quantize_stacked_ffn,
            )

            params = dict(params)
            int8_parts = (("encoder", "decoder") if mode == "fast-int8-full"
                          else ("decoder",))
            for part in int8_parts:
                params[part] = dict(params[part])
                params[part]["layers"] = quantize_stacked_ffn(params[part]["layers"])
            params["vocos"] = dict(params["vocos"])
            params["vocos"]["blocks"] = quantize_stacked_convnext(params["vocos"]["blocks"])
            fk = fast_mode_settings()
            detok_ffn_impl = fk["int8_ffn_impl"]
            if mode == "fast-int8-full":
                ffn_impl = fk["int8_ffn_impl"]
            int8_vocos = fk["int8_vocos"]
        if data_parallel and len(jax.devices()) > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            self.mesh = Mesh(np.array(jax.devices()), ("data",))
            self._data_sharding = NamedSharding(self.mesh, P("data"))
            self.params = jax.device_put(params, NamedSharding(self.mesh, P()))
        else:
            self.params = jax.device_put(params)
        self.batch_size = batch_size
        if wire not in ("float32", "pcm16"):
            raise ValueError(f"wire must be 'float32' or 'pcm16', got {wire!r}")
        self.wire = wire
        # Tiny elementwise converters around the (AOT-cached) main programs:
        # the wire dtype never changes the traced tokenize/detokenize
        # programs or their serialized executables.  Dequant multiplies by a
        # power of two (exact); quant mirrors save_audio's clip+truncate.
        chunk_n = cfg.chunk_samples
        self._dequant_pcm16 = jax.jit(
            lambda x: jnp.pad(
                x.astype(jnp.float32) * jnp.float32(1.0 / 32768.0),
                ((0, 0), (0, chunk_n - x.shape[1]))))
        self._quant_pcm16 = jax.jit(
            lambda y: jnp.clip(y * jnp.float32(32768.0), -32768.0, 32767.0)
            .astype(jnp.int16))
        # transfer granularity for the int16 encode wire: host pads only to
        # the next bucket, the dequant jit pads to the fixed program shape on
        # device — short utterances ship ~T bytes instead of the 30 s window.
        # _dequant_pcm16 retraces per distinct (padded_batch, bucket) pair, so
        # a serving host with varied request batch sizes compiles up to
        # 10 x n_batch_shapes tiny elementwise programs (cheap: each is a
        # pad+scale; the expensive tokenize program is shape-stable).
        self._wire_bucket = max(1, chunk_n // 10)
        self.input_sample_rate = cfg.input_sample_rate
        self.output_sample_rate = cfg.output_sample_rate
        self.max_audio_seconds = cfg.max_audio_seconds
        self.encoder_downsample_rate = cfg.encoder_downsample_rate
        self.decoder_upsample_rate = cfg.decoder_upsample_rate
        self.num_groups = cfg.quantizer.num_groups

        prec = {
            "highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT,
        }[precision]

        # fused Pallas kernels only where Mosaic compiles them; the CPU
        # backend would fall back to the (slow) interpreter
        fused = (mode in ("fast", "fast-int8", "fast-int8-full")
                 and jax.default_backend() != "cpu")
        # trace_counts[name] increments each time jit (re)traces that program:
        # the public observability hook for "how many executables exist"
        # (fixed-shape padding should keep it at 1 per direction).  On AOT
        # warm starts the count stays 0 — the executable came from disk and
        # was never traced in this process (warm_jit.source says which).
        self.trace_counts = {"tokenize": 0, "detokenize": 0}

        def _counted(name, fn):
            def wrapped(*args, **kwargs):
                self.trace_counts[name] += 1  # runs at trace time only
                return fn(*args, **kwargs)

            return wrapped

        # AOT warm start (utils/aot.py): opt in with aot_dir or the
        # SIMWHISPER_AOT_DIR env var — serialized executables skip the
        # per-session XLA compile entirely (the std compilation cache hangs
        # on tunneled backends; docs/TPU_NOTES.md)
        import os

        aot_dir = aot_dir or os.environ.get("SIMWHISPER_AOT_DIR") or None
        fingerprint = repr((cfg, mode, self._attn_impl, precision, batch_size,
                            data_parallel))

        def _build(name, fn):
            if aot_dir:
                from simwhisper_codec_tpu.utils.aot import warm_jit

                return warm_jit(_counted(name, fn), aot_dir=aot_dir, tag=name,
                                fingerprint=fingerprint)
            return jax.jit(_counted(name, fn))

        self._tokenize = _build(
            "tokenize",
            partial(tokenize, cfg, self.consts, precision=prec, attn_impl=self._attn_impl,
                    fused_ffn=fused, ffn_impl=ffn_impl),
        )
        self._detokenize = _build(
            "detokenize",
            partial(detokenize, cfg, self.consts, precision=prec, attn_impl=self._attn_impl,
                    fused_vocos=(int8_vocos if int8_vocos is not None else fused),
                    fused_ffn=fused, ffn_impl=detok_ffn_impl or ffn_impl),
        )

    # -- single-chunk paths (parity with inference_tokenize/detokenize) -----

    def _pad_batch_dim(self, b: int) -> int:
        """Fixed compiled batch: pad small batches up to ``batch_size`` so the
        corpus tail / single requests reuse the same executable."""
        return self.batch_size if b < self.batch_size else b

    def inference_tokenize(self, wav: np.ndarray, input_lengths: np.ndarray) -> dict:
        """wav (B, T<=chunk_samples) host array -> codes (device arrays).

        int16 input is interpreted as PCM16 and dequantized ON DEVICE
        (int16/32768, exact in f32) — with ``wire="pcm16"`` float input is
        first snapped to the PCM16 grid on host so the transfer ships half
        the bytes."""
        wav = np.asarray(wav)
        if self.wire == "pcm16" and wav.dtype != np.int16:
            wav = np.clip(wav.astype(np.float32) * 32768.0, -32768, 32767).astype(np.int16)
        b, t = wav.shape
        n = self.cfg.chunk_samples
        if wav.dtype == np.int16:
            # ship only a bucket-padded slice; device pads to the program
            # shape (the transfer is the serving bottleneck, not the pad)
            target = min(n, -(-min(t, n) // self._wire_bucket) * self._wire_bucket)
        else:
            target = n
        if t < target:
            wav = np.pad(wav, ((0, 0), (0, target - t)))
        else:
            wav = wav[:, :target]
        bp = self._pad_batch_dim(b)
        if bp != b:
            wav = np.pad(wav, ((0, bp - b), (0, 0)))
            input_lengths = np.pad(np.asarray(input_lengths), (0, bp - b))
        wav_arr = (jnp.asarray(wav) if wav.dtype == np.int16
                   else jnp.asarray(wav, jnp.float32))
        len_arr = jnp.asarray(input_lengths)
        if self._data_sharding is not None:
            wav_arr, len_arr = self._shard_batch(wav_arr, len_arr)
        if wav_arr.dtype == jnp.int16:
            wav_arr = self._dequant_pcm16(wav_arr)
        out = self._tokenize(self.params, wav_arr, len_arr)
        if wav_arr.shape[0] != b:  # drop device-padding rows
            out = {
                "zq": out["zq"][:b],
                "codes": out["codes"][:, :b],
                "codes_lengths": out["codes_lengths"][:b],
            }
        return out

    def inference_detokenize(
        self, codes: np.ndarray, codes_lengths: np.ndarray,
        chunk_width: Optional[int] = None, out_samples: Optional[int] = None,
    ) -> dict:
        """codes (G, B, T<=code_frames) -> waveform (device arrays)."""
        g, b, t = codes.shape
        n = self.cfg.code_frames
        width = chunk_width if chunk_width is not None else t
        if t < n:
            codes = np.pad(codes, ((0, 0), (0, 0), (0, n - t)))
        bp = self._pad_batch_dim(b)
        if bp != b:
            codes = np.pad(codes, ((0, 0), (0, bp - b), (0, 0)))
            codes_lengths = np.pad(np.asarray(codes_lengths), (0, bp - b))
        codes_arr = jnp.asarray(codes, jnp.int32)
        len_arr = jnp.asarray(codes_lengths)
        if self._data_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            nd = self.mesh.devices.size
            pad_b = (-codes_arr.shape[1]) % nd
            if pad_b:
                codes_arr = jnp.pad(codes_arr, ((0, 0), (0, pad_b), (0, 0)))
                len_arr = jnp.pad(len_arr, ((0, pad_b),))
            codes_arr = jax.device_put(
                codes_arr, NamedSharding(self.mesh, P(None, "data"))
            )
            len_arr = jax.device_put(len_arr, self._data_sharding)
        out = self._detokenize(
            self.params, codes_arr, len_arr, jnp.asarray(width, jnp.int32)
        )
        if self.wire == "pcm16":  # quantize on device: half the bytes home
            out = dict(out)
            y = self._quant_pcm16(out["y"])
            if out_samples is not None and out_samples < y.shape[-1]:
                # slice on device: the chunk loop only keeps the first
                # stride's worth, so the overlap tail never crosses the wire
                y = y[:, :out_samples]
            out["y"] = y
        if codes_arr.shape[1] != b:  # drop device-padding rows
            out = {"y": out["y"][:b], "output_length": out["output_length"][:b]}
        return out

    def _shard_batch(self, wav_arr, len_arr):
        """Pad the batch to a device-count multiple and shard over 'data'."""
        n = self.mesh.devices.size
        b = wav_arr.shape[0]
        pad = (-b) % n
        if pad:
            wav_arr = jnp.pad(wav_arr, ((0, pad), (0, 0)))
            len_arr = jnp.pad(len_arr, ((0, pad),))
        wav_arr = jax.device_put(wav_arr, self._data_sharding)
        len_arr = jax.device_put(len_arr, self._data_sharding)
        return wav_arr, len_arr

    # -- chunked streaming (parity with model.py:244-373) --------------------

    def encode(self, wav_list: List[np.ndarray], overlap_seconds: int = 10) -> dict:
        """List of 1-D waveforms -> {"codes_list": [ (G, T_i) int32 ]}."""
        cfg = self.cfg
        duration_seconds = self.max_audio_seconds - overlap_seconds
        chunk_size = self.max_audio_seconds * self.input_sample_rate
        duration_size = duration_seconds * self.input_sample_rate
        code_duration_length = duration_size // self.encoder_downsample_rate

        batch_size = len(wav_list)
        max_length = max(len(w) for w in wav_list)
        input_lengths = np.array([len(w) for w in wav_list], np.int64)
        wire16 = self.wire == "pcm16" or all(
            np.asarray(w).dtype == np.int16 for w in wav_list)
        wav_tensor = np.zeros((batch_size, max_length),
                              np.int16 if wire16 else np.float32)
        for i, w in enumerate(wav_list):
            w = np.asarray(w).reshape(-1)
            if wire16 and w.dtype != np.int16:
                w = np.clip(w.astype(np.float32) * 32768.0, -32768, 32767).astype(np.int16)
            elif not wire16 and w.dtype == np.int16:
                # mixed-dtype batch on the float wire: rescale PCM16 entries
                # so they land on the same [-1, 1] scale as the float ones
                w = w.astype(np.float32) / 32768.0
            wav_tensor[i, : len(w)] = (w if wire16
                                       else np.asarray(w, np.float32))

        max_chunks = (max_length + duration_size - 1) // duration_size
        chunks_out = []
        for chunk_idx in range(max_chunks):
            start = chunk_idx * duration_size
            end = min(start + chunk_size, max_length)
            chunk = wav_tensor[:, start:end]
            chunk_lengths = np.clip(input_lengths - start, 0, end - start)
            if chunk_lengths.max() == 0:
                continue

            result = self.inference_tokenize(chunk, chunk_lengths)
            codes = np.asarray(result["codes"])  # (G, B, code_frames)
            code_lens = np.asarray(result["codes_lengths"])

            valid = np.clip(code_lens, 0, code_duration_length)
            out = codes[:, :, :code_duration_length].copy()
            # zero beyond each sample's valid region (already zero via FSQ
            # masking, but enforce for exact reference behavior)
            t_idx = np.arange(code_duration_length)
            out *= (t_idx[None, None, :] < valid[None, :, None]).astype(out.dtype)
            chunks_out.append(out)

        if chunks_out:
            codes_tensor = np.concatenate(chunks_out, axis=-1)
            codes_list = [
                codes_tensor[:, i, : input_lengths[i] // self.encoder_downsample_rate]
                for i in range(batch_size)
            ]
        else:
            codes_list = [np.zeros((self.num_groups, 0), np.int32) for _ in range(batch_size)]
        return {"codes_list": codes_list}

    def decode(self, codes_list: List[np.ndarray], overlap_seconds: int = 10) -> dict:
        """List of (G, T_i) code arrays -> {"syn_wav_list": [ (T_i*1280,) ]}.

        Waveforms are f32, or int16 PCM when ``wire="pcm16"`` (the device
        quantizes with the exact save_audio formula before transfer)."""
        duration_seconds = self.max_audio_seconds - overlap_seconds
        chunk_code_length = self.max_audio_seconds * self.input_sample_rate // self.encoder_downsample_rate
        duration_code_length = duration_seconds * self.input_sample_rate // self.encoder_downsample_rate
        duration_wav_length = duration_code_length * self.decoder_upsample_rate

        batch_size = len(codes_list)
        max_code_length = max(c.shape[-1] for c in codes_list)
        code_lengths = np.array([c.shape[-1] for c in codes_list], np.int64)
        codes_tensor = np.zeros((self.num_groups, batch_size, max_code_length), np.int32)
        for i, c in enumerate(codes_list):
            codes_tensor[:, i, : c.shape[-1]] = np.asarray(c)

        max_chunks = (max_code_length + duration_code_length - 1) // duration_code_length
        wav_chunks = []
        for chunk_idx in range(max_chunks):
            start = chunk_idx * duration_code_length
            end = min(start + chunk_code_length, max_code_length)
            chunk_codes = codes_tensor[:, :, start:end]
            chunk_code_lengths = np.clip(code_lengths - start, 0, end - start)
            if chunk_code_lengths.max() == 0:
                continue

            result = self.inference_detokenize(
                chunk_codes, chunk_code_lengths, chunk_width=end - start,
                out_samples=duration_wav_length)
            wav = np.asarray(result["y"])  # (B, chunk_samples)
            wav_lens = np.asarray(result["output_length"])

            valid = np.clip(wav_lens, 0, duration_wav_length)
            out = wav[:, :duration_wav_length].copy()
            t_idx = np.arange(duration_wav_length)
            out *= (t_idx[None, :] < valid[:, None]).astype(out.dtype)
            wav_chunks.append(out)

        if wav_chunks:
            wav_tensor = np.concatenate(wav_chunks, axis=-1)
            syn_wav_list = [
                wav_tensor[i, : code_lengths[i] * self.decoder_upsample_rate]
                for i in range(batch_size)
            ]
        else:
            out_dtype = np.int16 if self.wire == "pcm16" else np.float32
            syn_wav_list = [np.zeros((0,), out_dtype) for _ in range(batch_size)]
        return {"syn_wav_list": syn_wav_list}

    @classmethod
    def load_from_checkpoint(cls, config_path: str, ckpt_path: str, **kwargs) -> "AudioCodec":
        """Mirror of model.py:375-396. Accepts a torch ``.pt`` file or a native
        Orbax checkpoint directory (see tools/convert_checkpoint.py)."""
        logger.info("Loading model from %s and %s", config_path, ckpt_path)
        cfg = load_config(config_path)
        if Path(ckpt_path).is_dir():
            from simwhisper_codec_tpu.utils.checkpoint import load_orbax

            params = load_orbax(ckpt_path, init_params(jax.random.PRNGKey(0), cfg))
        else:
            from simwhisper_codec_tpu.utils.checkpoint import load_codec_params

            params = load_codec_params(ckpt_path, cfg)
        return cls(cfg, params, **kwargs)
