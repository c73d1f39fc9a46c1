from amcpy_tpu.models.classifier import AMCClassifier
from amcpy_tpu.models.cnn import IQConvNet

__all__ = ["AMCClassifier", "IQConvNet"]
