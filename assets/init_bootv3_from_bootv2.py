"""Initialise bootv3 (RGB-D, in_channels=4) from bootv2's RGB weights.

The reference buys its base-model capability with COCO transfer
(robotpose/training/__init__.py:10-15); we apply the same pattern to our
own synthetic-pretrained base: every bootv2 parameter is reused verbatim
and the single shape mismatch — the ResNet stem conv kernel
[7,7,3,64] -> [7,7,4,64] — is padded with zeros on the new depth channel.
The init is therefore *function-identical* to bootv2 on RGB inputs; the
depth channel starts ignored and is learned during the (much shorter)
RGB-D fine-tune, with the pipeline's 8% depth-dropout augmentation
keeping the RGB pathway alive.

Writes models/bootv3/ckpt_0000.  Fine-tune with:
    python assets/train_bootv3.py --resume models/bootv3/ckpt_0000 \
        --steps 5000 --peak-lr 2e-3
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # pure host-side tree surgery
os.environ.setdefault("ROPES3D_ROOT", "/root/repo")
sys.path.insert(0, os.environ["ROPES3D_ROOT"])

import numpy as np


def pad_stem(tree, found):
    if isinstance(tree, dict):
        return {k: pad_stem(v, found) for k, v in tree.items()}
    arr = np.asarray(tree)
    if arr.ndim == 4 and arr.shape[:3] == (7, 7, 3):
        found.append(arr.shape)
        pad = np.zeros((7, 7, 1) + arr.shape[3:], arr.dtype)
        return np.concatenate([arr, pad], axis=2)
    return arr


def newest_ckpt(model_dir):
    """Highest-numbered checkpoint dir (same rule evaluate() uses)."""
    idx = [
        int(f.split("_")[1])
        for f in os.listdir(model_dir)
        if f.startswith("ckpt_") and f.split("_")[1].isdigit()
    ]
    if not idx:
        raise FileNotFoundError(f"no ckpt_NNNN in {model_dir}")
    return os.path.join(model_dir, f"ckpt_{max(idx):04d}")


def main():
    import argparse

    import orbax.checkpoint as ocp

    from ropes3d_tpu.config import Paths

    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true",
                    help="overwrite an existing destination ckpt")
    args = ap.parse_args()

    src = newest_ckpt(os.path.join(Paths().MODELS, "bootv2"))
    dst = os.path.join(Paths().MODELS, "bootv3", "ckpt_0000")
    if os.path.exists(dst) and not args.force:
        raise SystemExit(f"{dst} exists; pass --force to overwrite")
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(src)
    found = []
    out = pad_stem(raw, found)
    assert len(found) == 1, f"expected exactly one stem kernel, got {found}"
    ckptr.save(os.path.abspath(dst), out, force=True)
    ckptr.wait_until_finished()
    print(f"padded stem {found[0]} -> 4ch; wrote {dst}")


if __name__ == "__main__":
    main()
