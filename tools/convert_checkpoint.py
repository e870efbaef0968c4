"""One-time checkpoint conversion: reference torch .pt -> native Orbax.

The torch reader is only needed once; converted checkpoints load without
torch, faster, and with per-tensor integrity reporting.

Usage:
  python tools/convert_checkpoint.py --config config/SimWhisperCodec.yaml \
      --torch_checkpoint weights/SimWhisperCodec.pt --out weights/orbax
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from simwhisper_codec_tpu.config import load_config
from simwhisper_codec_tpu.utils.checkpoint import load_codec_params, save_orbax
from simwhisper_codec_tpu.utils.params import format_param_report


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config/SimWhisperCodec.yaml")
    p.add_argument("--torch_checkpoint", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    cfg = load_config(args.config)
    params = load_codec_params(args.torch_checkpoint, cfg)
    print(format_param_report(params))

    # per-tensor checksum report for import verification
    import jax

    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        arr = np.asarray(leaf)
        total += arr.size
        print(f"  {name:<60} {str(arr.shape):<20} sum={float(arr.sum()):+.6e}")
    print(f"total parameters: {total:,}")

    save_orbax(args.out, params)
    print(f"saved Orbax checkpoint to {args.out}")


if __name__ == "__main__":
    main()
