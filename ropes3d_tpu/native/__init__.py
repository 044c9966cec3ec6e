"""ctypes bindings to the optional C++ runtime (``csrc/``).

The TPU compute path is JAX/XLA/Pallas; the host runtime around it (mesh
ingest, dataset compilation, image morphology) has C++ fast paths built from
``csrc/`` into ``libropes3d.so``.  Everything here degrades gracefully to the
pure-numpy implementations when the library has not been built.
"""

from . import lib  # noqa: F401
from . import stl  # noqa: F401
