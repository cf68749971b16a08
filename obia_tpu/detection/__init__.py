"""Detection subsystem exports (the reference's only non-empty __init__,
reference detection/__init__.py:1-6)."""
from .models import build_detection_model
from .predict import predict
from .train import train_model
from .utils import calculate_iou

__all__ = ["build_detection_model", "train_model", "predict",
           "calculate_iou"]
