"""Sanity checks on the analytic FLOPs ledger used for MFU accounting."""

import dataclasses

from simwhisper_codec_tpu.config import CodecConfig
from simwhisper_codec_tpu.utils.flops import codec_flops, peak_tflops


def test_ledger_consistency():
    cfg = CodecConfig()
    led = codec_flops(cfg)
    assert all(v > 0 for v in led.values())
    tok_parts = ["mel_dft", "mel_filterbank", "encoder_convs",
                 "encoder_transformer", "downsample"]
    detok_parts = ["upsample", "decoder_transformer", "decoder_deconvs",
                   "vocos_embed", "vocos_convnext", "vocos_head", "istft"]
    assert led["total_tokenize"] == sum(led[k] for k in tok_parts)
    assert led["total_detokenize"] == sum(led[k] for k in detok_parts)
    assert led["total"] == led["total_tokenize"] + led["total_detokenize"]
    # the production model is ~1.3 TFLOP per 30 s chunk; keep the ledger
    # anchored so accidental unit slips (MACs vs FLOPs, frames vs samples) trip
    assert 1.0e12 < led["total"] < 1.7e12


def test_ledger_scales_with_depth():
    cfg = CodecConfig()
    deeper = dataclasses.replace(
        cfg, vocos=dataclasses.replace(cfg.vocos, num_layers=cfg.vocos.num_layers * 2)
    )
    a, b = codec_flops(cfg), codec_flops(deeper)
    assert b["vocos_convnext"] == 2 * a["vocos_convnext"]
    assert b["total"] > a["total"]


def test_peak_lookup():
    class Dev:
        device_kind = "TPU v5 lite"

    assert peak_tflops(Dev()) == 197.0

    class Unknown:
        device_kind = "FPGA???"

    assert peak_tflops(Unknown()) == 0.0
