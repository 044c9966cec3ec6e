"""File-based IPC with the robot controller.

Parity port of ``robotpose/textfile_integration.py:19-74``: busy-polls a
LAN-shared ``joint_states.json`` written by the ROS side, returns the
reported pose, and deletes the file to signal the robot to advance.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional

import numpy as np

from ..config import JSON_LINK_FILE


class JSONCoupling:
    def __init__(self, path: str = None, poll_interval: float = 0.05):
        self.path = path or JSON_LINK_FILE
        self.poll_interval = poll_interval
        self.read_failures = 0
        self.delete_failures = 0

    def get_pose(self, timeout: Optional[float] = None) -> List[float]:
        """Block until the shared file appears and parses; return 6 angles."""
        t0 = time.time()
        while True:
            if os.path.isfile(self.path):
                try:
                    with open(self.path) as f:
                        data = json.load(f)
                    joints = data["objects"][0]["joints"]
                    return [float(j["angle"]) for j in joints[:6]]
                except (json.JSONDecodeError, KeyError, OSError):
                    # Mid-write or contended file: retry (reference
                    # textfile_integration.py:29-50 retries forever).
                    self.read_failures += 1
            if timeout is not None and time.time() - t0 > timeout:
                raise TimeoutError(f"No pose file at {self.path}")
            time.sleep(self.poll_interval)

    def reset(self, timeout: Optional[float] = 5.0) -> None:
        """Delete the file -> robot moves to its next pose."""
        t0 = time.time()
        while os.path.isfile(self.path):
            try:
                os.remove(self.path)
                return
            except OSError:
                self.delete_failures += 1
            if timeout is not None and time.time() - t0 > timeout:
                raise TimeoutError(f"Could not delete {self.path}")
            time.sleep(self.poll_interval)
