#!/usr/bin/env python
"""Thin wrapper matching the reference repo-root entry point."""
from ropes3d_tpu.cli.predict_dataset import main

if __name__ == "__main__":
    main()
