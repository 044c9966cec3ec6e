#!/usr/bin/env python
"""Thin wrapper matching the reference repo-root entry point."""
from ropes3d_tpu.cli.wizard import main

if __name__ == "__main__":
    main()
from ropes3d_tpu.cli.wizard import Wizard, MeshViewer  # noqa: F401
