"""Export a native work dir to the reference's PyTorch format.

The inverse of torch_import: writes model.pt (state_dict),
model_config.pt (args dict), and mappings.pt (maps with tuple keys) so a
model trained here can be loaded by the reference's build_model/generate
(generate.py:307-348).

    python -m midi_emotion_tpu.convert.torch_export --model_dir <native_dir> \
        --out_dir <torch_dir>
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description="Export checkpoint to PyTorch format")
    ap.add_argument("--model_dir", required=True, help="native work dir")
    ap.add_argument("--out_dir", required=True)
    args = ap.parse_args(argv)

    import torch

    from ..training.checkpoint import load_model_dir
    from .torch_import import params_to_torch_state_dict

    cfg, params, vocab = load_model_dir(args.model_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    sd = params_to_torch_state_dict(params, cfg)
    torch.save(sd, os.path.join(args.out_dir, "model.pt"))
    torch.save(cfg.to_reference_dict(), os.path.join(args.out_dir, "model_config.pt"))
    torch.save(vocab.get_maps(), os.path.join(args.out_dir, "mappings.pt"))
    print(f"Exported to {args.out_dir}")


if __name__ == "__main__":
    main()
