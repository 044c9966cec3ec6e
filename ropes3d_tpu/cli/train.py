"""Segmentation training entry (reference ``train.py:60-69``)."""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset")
    p.add_argument("-batch_size", type=int, default=2, choices=[1, 2, 4, 8, 12, 16])
    p.add_argument("-cont", action="store_true", help="Continue from same-dataset model")
    p.add_argument("-cont_from", default=None, help="Continue from model id")
    p.add_argument("-epochs", type=int, default=300)
    p.add_argument("-depth", type=int, default=101, choices=[18, 34, 50, 101])
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-tiny", action="store_true", help="CI-sized model")
    a = p.parse_args()
    from ..training.train_entry import train

    train(
        a.dataset,
        batch_size=a.batch_size,
        cont=a.cont,
        cont_from=a.cont_from,
        num_epochs=a.epochs,
        depth=a.depth,
        lr=a.lr,
        tiny=a.tiny,
    )


if __name__ == "__main__":
    main()
