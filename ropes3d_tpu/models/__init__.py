"""JAX/Flax segmentation models.

TPU-native replacement for the reference's PixelLib/TensorFlow Mask R-CNN
(reference train.py:48-54, robotpose/prediction/predict.py:96-98): a
ResNet-FPN Mask R-CNN implemented with static shapes throughout — padded
top-k proposals, fixed-iteration NMS, fixed RoI counts — so the whole
detector jits cleanly and trains under pjit data parallelism.
"""

from .mask_rcnn import MaskRCNN, MaskRCNNConfig

__all__ = ["MaskRCNN", "MaskRCNNConfig"]
