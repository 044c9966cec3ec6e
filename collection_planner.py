#!/usr/bin/env python
"""Thin wrapper matching the reference repo-root entry point."""
from ropes3d_tpu.cli.collection_planner import main

if __name__ == "__main__":
    main()
