"""Automatic dataset annotation (reference ``annotate.py:22-34``)."""

from __future__ import annotations

import argparse


def label(dataset: str, preview: bool = False) -> str:
    from ..data.annotation import AutomaticAnnotator

    return AutomaticAnnotator(dataset, preview=preview).run()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset")
    p.add_argument("-no_preview", action="store_true")
    a = p.parse_args()
    label(a.dataset, preview=not a.no_preview)


if __name__ == "__main__":
    main()
