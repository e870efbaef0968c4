"""LJSpeech-style data preparation: scan, filter, split, JSON manifests.

Mirrors ``hifigan_experiments/hifigan_continue_whisper/data_prepare.py:25-206``:
walk the corpus, drop utterances shorter than 1 s or silent, split
train/valid/test by ratio (80/10/10), write JSON manifests keyed by utterance
id with wav path + duration.  Idempotent via a fingerprint skip-guard like the
reference's config-pickle check (data_prepare.py:187-205).
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path
from typing import Dict, List

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from simwhisper_codec_tpu.utils.audio_io import find_audio_files, load_audio


def prepare_dataset(
    data_folder: str,
    save_folder: str,
    splits=("train", "valid", "test"),
    ratios=(0.8, 0.1, 0.1),
    min_duration: float = 1.0,
    silence_threshold: float = 1e-4,
    sample_rate: int = 16000,
    seed: int = 42,
) -> Dict[str, str]:
    """Scan -> filter -> split -> write ``<save_folder>/<split>.json`` manifests."""
    save = Path(save_folder)
    save.mkdir(parents=True, exist_ok=True)

    fingerprint = hashlib.sha256(
        json.dumps([data_folder, list(splits), list(ratios), min_duration, seed]).encode()
    ).hexdigest()[:16]
    guard = save / f".prep_{fingerprint}"
    manifest_paths = {s: str(save / f"{s}.json") for s in splits}
    if guard.exists() and all(Path(p).exists() for p in manifest_paths.values()):
        return manifest_paths

    records = []
    for path in find_audio_files(data_folder):
        wav = load_audio(path, target_sample_rate=sample_rate)
        duration = len(wav) / sample_rate
        if duration < min_duration:
            continue
        if float(np.abs(wav).max()) < silence_threshold:
            continue
        records.append({"id": Path(path).stem, "wav": str(path), "duration": duration})

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(records))
    n = len(records)
    bounds = np.cumsum([int(r * n) for r in ratios[:-1]])
    split_idx = np.split(order, bounds)

    for split, idx in zip(splits, split_idx):
        manifest = {records[i]["id"]: records[i] for i in idx}
        Path(manifest_paths[split]).write_text(json.dumps(manifest, indent=2))

    guard.touch()
    return manifest_paths


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--data_folder", required=True)
    p.add_argument("--save_folder", required=True)
    args = p.parse_args()
    paths = prepare_dataset(args.data_folder, args.save_folder)
    print(json.dumps(paths, indent=2))
