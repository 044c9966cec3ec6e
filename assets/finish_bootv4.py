"""Finalize a bootv4 training run from its newest on-disk checkpoint.

Contingency driver for wall-clock-bounded rounds: if train_bootv4.py is
stopped before its final step (checkpoints land every --ckpt-every
steps), this evaluates the newest checkpoint and registers it with
provenance derived from that checkpoint — the same eval/register path
train_bootv4.main() runs at completion (ADVICE round 4: provenance from
the artifact, never from argparse defaults).

Usage: python assets/finish_bootv4.py [--eval-n 64] [--steps-done N]
"""
import argparse
import os
import sys

os.environ.setdefault("ROPES3D_ROOT", "/root/repo")
sys.path.insert(0, os.environ["ROPES3D_ROOT"])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_bootv4 import evaluate, newest_ckpt, register  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-n", type=int, default=64)
    ap.add_argument("--steps-done", type=int, default=None,
                    help="actual steps completed (default: ckpt index * 2000)")
    args = ap.parse_args()

    from ropes3d_tpu.config import Paths

    out_dir = os.path.join(Paths().MODELS, "bootv4")
    ckpt = newest_ckpt(out_dir)
    idx = int(os.path.basename(ckpt).split("_")[1])
    steps = args.steps_done if args.steps_done is not None else idx * 2000
    notes = evaluate(ckpt, n=args.eval_n)
    register(out_dir, ckpt, steps, notes,
             resumed_from="models/bootv3 (newest ckpt)")
    print(f"registered bootv4 from {ckpt} ({steps} steps): {notes}")


if __name__ == "__main__":
    main()
