"""Cross-config weight transfer.

Re-derivation of the reference's checkpoint-surgery tool
(``src/models/transfer_model.py:30-47``): copy parameters by name from a
trained model into a freshly-initialized model of a (possibly different)
config, special-casing the token-embedding width mismatch between
conditioning modes (continuous_concat shrinks the embedding by d_condition)
by copying the overlapping channel slice. Works on native work dirs and,
via the converter, on reference PyTorch dirs; exposed as a CLI:

    python -m midi_emotion_tpu.convert.transfer --from_dir A --to_dir B
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import jax
import numpy as np


def transfer_params(src: Dict, dst: Dict) -> Dict:
    """Copy src leaves into dst wherever paths match; embedding tables of
    mismatched width transfer their overlapping slice (rows AND columns,
    covering both d_condition and vocab-size changes)."""
    src_flat = {
        "/".join(str(getattr(k, "key", k)) for k in kp): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(src)[0]
    }

    def merge(kp, dst_leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        if path not in src_flat:
            return dst_leaf
        s = np.asarray(src_flat[path])
        d = np.asarray(dst_leaf)
        if s.shape == d.shape:
            return s.astype(d.dtype)
        if path == "embedding/embedding":
            rows = min(s.shape[0], d.shape[0])
            cols = min(s.shape[1], d.shape[1])
            out = d.copy()
            out[:rows, :cols] = s[:rows, :cols]
            return out.astype(d.dtype)
        return dst_leaf  # incompatible; keep fresh init

    return jax.tree_util.tree_map_with_path(merge, dst)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Transfer weights across configs")
    ap.add_argument("--from_dir", required=True, help="trained model dir")
    ap.add_argument("--to_dir", required=True,
                    help="target dir with model_config.json (e.g. from a "
                    "1-step training run); model.msgpack is overwritten")
    args = ap.parse_args(argv)

    from ..training.checkpoint import load_model_dir, save_checkpoint

    src_cfg, src_params, src_vocab = load_model_dir(args.from_dir)
    dst_cfg, dst_params, dst_vocab = load_model_dir(args.to_dir)
    merged = transfer_params(src_params, dst_params)
    save_checkpoint(args.to_dir, merged, dst_cfg, dst_vocab)
    print(f"Saved to {args.to_dir}/model.msgpack")


if __name__ == "__main__":
    main()
